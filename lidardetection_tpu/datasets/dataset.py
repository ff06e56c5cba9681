"""Dataset template (mirrors pcdet/datasets/dataset.py:13-185).

prepare_data pipeline: augment (train) -> class filter -> point-feature
encode -> processor chain (mask/shuffle/voxelize) -> fixed-capacity padding.
Unlike the reference's ragged collate (batch-idx-prefixed concat,
dataset.py:153-185), samples here are already fixed-shape, so collation is a
plain stack — the batch is a static-shape pytree ready for jit/shard_map.
"""

from pathlib import Path

import numpy as np

from ..utils.common import keep_arrays_by_name
from .processor.data_processor import DataProcessor
from .processor.point_feature_encoder import PointFeatureEncoder


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = Path(root_path) if root_path is not None else \
            Path(dataset_cfg['DATA_PATH']) if dataset_cfg else None
        if dataset_cfg is None or class_names is None:
            return

        self.point_cloud_range = np.array(dataset_cfg['POINT_CLOUD_RANGE'], np.float32)
        self.max_gt_boxes = int(dataset_cfg.get('MAX_GT_BOXES', 64))
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg['POINT_FEATURE_ENCODING'],
            point_cloud_range=self.point_cloud_range)
        if self.training and dataset_cfg.get('DATA_AUGMENTOR'):
            from .augmentor.data_augmentor import DataAugmentor
            self.data_augmentor = DataAugmentor(
                self.root_path, dataset_cfg['DATA_AUGMENTOR'], class_names,
                logger=logger)
        else:
            self.data_augmentor = None
        self.data_processor = DataProcessor(
            dataset_cfg['DATA_PROCESSOR'],
            point_cloud_range=self.point_cloud_range, training=self.training,
            max_points=int(dataset_cfg.get('MAX_POINTS', 0)) or None)
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self.total_epochs = 0
        self._merge_all_iters_to_one_epoch = False
        # host-side sparse rulebook plan (ops/sparse_plan.py), set by
        # build_dataloader(model_cfg=...) when the model has a sparse
        # 3D backbone: rulebooks are built on CPU workers per scan and ride
        # the batch, so the device never sorts
        self.sparse_plan = None

    def set_sparse_plan(self, model_cfg):
        """Derive and attach the host rulebook plan from a MODEL cfg."""
        max_voxels = getattr(self.data_processor, 'max_voxels', None)
        if self.grid_size is None or model_cfg is None or max_voxels is None:
            return
        from ..ops.sparse_plan import backbone_plan
        # training plans additionally ship each down op's transposed
        # rulebook so the conv backward stays on the Pallas kernel
        self.sparse_plan = backbone_plan(
            model_cfg, tuple(int(g) for g in self.grid_size),
            int(max_voxels), training=self.training)

    @property
    def mode(self):
        return 'train' if self.training else 'test'

    @property
    def dataset_info(self):
        """Static info the network builder needs."""
        return {
            # point-based pipelines (PointRCNN) have no voxelizer -> None
            'grid_size': tuple(int(g) for g in self.grid_size)
            if self.grid_size is not None else None,
            'voxel_size': tuple(float(v) for v in self.voxel_size)
            if self.voxel_size is not None else None,
            'point_cloud_range': tuple(float(x) for x in self.point_cloud_range),
            'num_point_features': self.point_feature_encoder.num_point_features,
        }

    def merge_all_iters_to_one_epoch(self, merge=True, epochs=None):
        self._merge_all_iters_to_one_epoch = merge
        self.total_epochs = epochs if merge else 0

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        raise NotImplementedError

    def prepare_data(self, data_dict):
        """Per-sample pipeline (dataset.py:97-151). Returns fixed-shape dict."""
        if self.training:
            assert 'gt_boxes' in data_dict
            gt_boxes_mask = np.array(
                [n in self.class_names for n in data_dict['gt_names']], dtype=bool)
            if self.data_augmentor is not None:
                data_dict = self.data_augmentor.forward(
                    data_dict={**data_dict, 'gt_boxes_mask': gt_boxes_mask})
            else:
                data_dict['gt_boxes'] = data_dict['gt_boxes'][gt_boxes_mask]
                data_dict['gt_names'] = data_dict['gt_names'][gt_boxes_mask]
            if len(data_dict['gt_boxes']) == 0:
                new_index = np.random.randint(len(self))
                return self[new_index]

        if data_dict.get('gt_boxes', None) is not None:
            selected = keep_arrays_by_name(data_dict['gt_names'], self.class_names)
            data_dict['gt_boxes'] = data_dict['gt_boxes'][selected]
            data_dict['gt_names'] = data_dict['gt_names'][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict['gt_names']],
                dtype=np.int32)
            data_dict['gt_boxes'] = np.concatenate(
                (data_dict['gt_boxes'],
                 gt_classes.reshape(-1, 1).astype(np.float32)), axis=1)
            for key in ('locations', 'rotations_y'):
                if data_dict.get(key, None) is not None:
                    data_dict[key] = data_dict[key][selected]

        data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict=data_dict)
        data_dict.pop('gt_names', None)

        if self.sparse_plan is not None and 'voxel_coords' in data_dict:
            from ..ops.sparse_plan import build_host_rulebooks
            data_dict.update(build_host_rulebooks(
                self.sparse_plan, data_dict['voxel_coords'],
                data_dict['num_voxels']))

        # fixed-capacity gt padding (class col 0 marks padding)
        if data_dict.get('gt_boxes', None) is not None:
            gt = data_dict['gt_boxes']
            out = np.zeros((self.max_gt_boxes, gt.shape[1]), np.float32)
            n = min(len(gt), self.max_gt_boxes)
            out[:n] = gt[:n]
            data_dict['gt_boxes'] = out
            for key in ('locations', 'rotations_y'):
                if data_dict.get(key, None) is not None:
                    arr = data_dict[key]
                    padded = np.zeros((self.max_gt_boxes, *arr.shape[1:]),
                                      np.float32)
                    padded[:n] = arr[:n]
                    data_dict[key] = padded
        return data_dict

    @staticmethod
    def collate_batch(batch_list):
        """Stack fixed-shape samples into a batch pytree."""
        keys = batch_list[0].keys()
        ret = {}
        for key in keys:
            vals = [s[key] for s in batch_list]
            if key in ('frame_id', 'metadata', 'calib', 'use_lead_xyz', 'image_shape'):
                ret[key] = np.asarray(vals) if key != 'calib' else vals
                continue
            ret[key] = np.stack(vals, axis=0)
        ret['batch_size'] = len(batch_list)
        return ret

    def array_batch_keys(self):
        """Keys forwarded to the device step."""
        keys = ['voxels', 'voxel_coords', 'voxel_num_points', 'num_voxels',
                'points', 'num_points', 'gt_boxes', 'bev_tile_starts']
        if self.sparse_plan is not None:
            keys += self.sparse_plan.batch_keys()
        return keys
