"""Livox datasets (fork extensions).

Mirrors pcdet/datasets/livox/livox_dataset.py and
livox_multiframe_dataset.py: directory layout pointcloud/<id>.bin +
label/<id>.pkl (list of {'name', 'box3d_lidar'}), category fusion
(car/police_car -> Car; bus/truck/engineering/trailer -> Truck), KITTI
protocol eval. Shares the PlusAI template protocol.
"""

import pickle

import numpy as np

from ..plusai.plusai_dataset import PlusAIDataset

NAME_FUSION = {
    'car': 'Car', 'police_car': 'Car',
    'bus': 'Truck', 'truck': 'Truck', 'Engineering_vehicles': 'Truck',
    'trailer': 'Truck',
}


class LivoxDataset(PlusAIDataset):
    STACK_FRAME_SIZE = 1
    BASE_FRAME_IDX = 0

    def get_lidar(self, idx):
        lidar_file = self.root_split_path / 'pointcloud' / f'{idx}.bin'
        assert lidar_file.exists(), lidar_file
        # livox dumps float64 clouds (livox_dataset.py:67: np.fromfile default)
        return np.fromfile(str(lidar_file)).reshape(-1, 4).astype(np.float32)

    def get_label(self, idx):
        label_file = self.root_split_path / 'label' / f'{idx}.pkl'
        with open(label_file, 'rb') as f:
            return pickle.load(f)

    def get_infos(self, num_workers=4, has_label=True, sample_id_list=None):
        """(livox_dataset.py:83-140) with category fusion."""
        import concurrent.futures as futures

        def process_single_scene(sample_idx):
            info = {'point_cloud': {'num_features': 4, 'lidar_idx': sample_idx},
                    'image': {'image_idx': sample_idx,
                              'image_shape': np.array([1920, 1080])},
                    'calib': {'P2': np.eye(4), 'R0_rect': np.eye(4),
                              'Tr_velo_to_cam': np.eye(4)}}
            if has_label:
                obj_labels = self.get_label(sample_idx)
                a = {}
                if len(obj_labels):
                    names = [NAME_FUSION.get(o['name'], o['name'])
                             for o in obj_labels]
                    n = len(obj_labels)
                    boxes = np.array([o['box3d_lidar'] for o in obj_labels],
                                     np.float64)
                    a['name'] = np.array(names)
                    a['truncated'] = np.zeros(n)
                    a['occluded'] = np.zeros(n, np.int64)
                    a['alpha'] = np.zeros(n)
                    a['bbox'] = np.ones((n, 4))
                    a['dimensions'] = boxes[:, 3:6]
                    a['location'] = boxes[:, 0:3]
                    a['rotation_y'] = boxes[:, 6]
                    a['score'] = np.ones(n)
                    a['difficulty'] = np.zeros(n, np.int32)
                    a['index'] = np.arange(n, dtype=np.int32)
                    a['gt_boxes_lidar'] = boxes[:, :7]
                info['annos'] = a
            return info

        sample_id_list = sample_id_list or self.sample_id_list
        with futures.ThreadPoolExecutor(num_workers) as executor:
            infos = executor.map(process_single_scene, sample_id_list)
        return list(infos)


class LivoxMultiFrameDataset(LivoxDataset):
    """Multiframe Livox variant (livox_multiframe_dataset.py): stacked
    5-feature clouds + per-frame poses, same protocol as
    PlusAIMultiframeDataset."""

    STACK_FRAME_SIZE = 3
    BASE_FRAME_IDX = 1

    def get_lidar(self, idx):
        lidar_file = self.root_split_path / 'pointcloud' / f'{idx}.bin'
        assert lidar_file.exists(), lidar_file
        return np.fromfile(str(lidar_file), dtype=np.float32).reshape(-1, 5)

    get_infos = PlusAIDataset.get_infos
