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
