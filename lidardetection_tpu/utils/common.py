"""Misc host utilities (mirrors parts of pcdet/utils/common_utils.py)."""

import logging
import random

import numpy as np


def keep_arrays_by_name(gt_names, used_classes):
    """Indices of entries whose name is in used_classes (common_utils.py:229)."""
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x not in used_classes]
    return np.array(inds, dtype=np.int64)


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    """Rank-0 console+file logger (common_utils.py:116-129)."""
    logger = logging.getLogger(__name__ + f'.rank{rank}')
    logger.setLevel(log_level if rank == 0 else 'ERROR')
    logger.propagate = False
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else 'ERROR')
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else 'ERROR')
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    """Seed all host RNGs (common_utils.py:132-136); device RNG uses
    jax.random keys derived from the same seed."""
    random.seed(seed)
    np.random.seed(seed)


def transform_mtx(trans, quat):
    """4x4 pose from translation + quaternion (x, y, z, w)
    (common_utils.py:15-19, fork pose utils)."""
    from scipy.spatial.transform import Rotation

    pose = np.eye(4)
    pose[0:3, 0:3] = Rotation.from_quat(quat).as_matrix()
    pose[:3, 3] = trans
    return pose


def interpolate_pose(pose1, pose2, t1, t2, t_out):
    """Linear translation + slerp rotation (common_utils.py:22-28)."""
    from scipy.spatial.transform import Rotation, Slerp

    tau = (t_out - t1) / (t2 - t1)
    trans = (1 - tau) * np.asarray(pose1[0]) + tau * np.asarray(pose2[0])
    slerp = Slerp([t1, t2], Rotation.from_quat([pose1[1], pose2[1]]))
    quat = slerp(t_out).as_quat()
    return trans, quat


def get_best_pose(timestamp, poses):
    """Interpolated pose at `timestamp` (common_utils.py:31-43)."""
    import bisect

    timestamps, pose_list = poses
    after_i = min(bisect.bisect_left(timestamps, timestamp),
                  len(timestamps) - 1)
    before_i = max(0, after_i - 1)
    if before_i == after_i:
        return pose_list[before_i]
    return interpolate_pose(pose_list[before_i], pose_list[after_i],
                            timestamps[before_i], timestamps[after_i],
                            timestamp)
