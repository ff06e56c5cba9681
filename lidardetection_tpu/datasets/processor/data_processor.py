"""Chained per-sample processors (host numpy).

Mirrors pcdet/datasets/processor/data_processor.py:10-131 with one structural
change: the output is FIXED-CAPACITY. Points are padded to MAX_POINTS and
voxels to MAX_NUMBER_OF_VOXELS with explicit counts — the static-shape
contract the jitted TPU step requires. The spconv VoxelGenerator is replaced
by lidardetection_tpu.ops.voxelize.
"""

import numpy as np

from ...core.np_geometry import mask_boxes_outside_range, mask_points_by_range
from ...ops.voxelize import grid_size_from_range, voxelize_np


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 max_points=None):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.mode = 'train' if training else 'test'
        self.grid_size = self.voxel_size = None
        self.max_points = max_points
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            cur_processor = getattr(self, cur_cfg['NAME'])(config=cur_cfg)
            self.data_processor_queue.append(cur_processor)

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.mask_points_and_boxes_outside_range(d, config)
        mask = mask_points_by_range(data_dict['points'], self.point_cloud_range)
        data_dict['points'] = data_dict['points'][mask]
        if data_dict.get('gt_boxes', None) is not None \
                and config.get('REMOVE_OUTSIDE_BOXES', False) and self.training:
            box_mask = mask_boxes_outside_range(
                data_dict['gt_boxes'], self.point_cloud_range, min_num_corners=1)
            data_dict['gt_boxes'] = data_dict['gt_boxes'][box_mask]
            for key in ('gt_names', 'locations', 'rotations_y'):
                if key in data_dict and data_dict[key] is not None \
                        and len(data_dict[key]) == len(box_mask):
                    data_dict[key] = data_dict[key][box_mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.shuffle_points(d, config)
        if config['SHUFFLE_ENABLED'][self.mode]:
            points = data_dict['points']
            idx = np.random.permutation(points.shape[0])
            data_dict['points'] = points[idx]
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        if data_dict is None:
            self.voxel_size = np.asarray(config['VOXEL_SIZE'], np.float32)
            self.grid_size = grid_size_from_range(
                self.point_cloud_range, self.voxel_size)
            self.max_points_per_voxel = config['MAX_POINTS_PER_VOXEL']
            self.max_voxels = config['MAX_NUMBER_OF_VOXELS'][self.mode]
            return lambda d: self.transform_points_to_voxels(d, config)
        voxels, coords, npts, nv = voxelize_np(
            data_dict['points'], self.point_cloud_range, self.voxel_size,
            self.max_points_per_voxel, self.max_voxels)
        if nv >= self.max_voxels and not self.training:
            # Saturated cap at eval: truncation keeps the FIRST max_voxels
            # voxels in scan order — a spatially biased crop (eval does not
            # shuffle points) that silently zeroes AP on whole regions
            # (diagnosed in TRAIN_TO_AP.md). Warn loudly; fix the config.
            import warnings
            warnings.warn(
                f'MAX_NUMBER_OF_VOXELS[test]={self.max_voxels} saturated '
                f'(scene produced >= cap); eval truncation is spatially '
                f'biased and can zero AP — raise the cap', RuntimeWarning,
                stacklevel=2)
        data_dict['voxels'] = voxels
        data_dict['voxel_coords'] = coords
        data_dict['voxel_num_points'] = npts
        data_dict['num_voxels'] = np.int32(nv)
        if self.grid_size[2] == 1:
            # pillar path: precompute the BEV scatter tile histogram here
            # (host searchsorted is ~free; the on-device fallback costs
            # ~0.6 ms/batch — see ops/scatter_tpu.host_tile_starts)
            from ...ops.scatter_tpu import host_tile_starts
            nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
            keys = np.where(coords[:, 0] >= 0,
                            coords[:, 1].astype(np.int64) * nx + coords[:, 2],
                            ny * nx)
            data_dict['bev_tile_starts'] = host_tile_starts(keys, ny * nx)
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        """Near/far-aware point subsampling (data_processor.py:82-115)."""
        if data_dict is None:
            return lambda d: self.sample_points(d, config)
        num_points = config['NUM_POINTS'][self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict['points']
        if num_points < len(points):
            pts_depth = np.linalg.norm(points[:, 0:3], axis=1)
            near_idxs = np.where(pts_depth < 40.0)[0]
            far_idxs = np.where(pts_depth >= 40.0)[0]
            choice = []
            if num_points > len(far_idxs):
                near_choice = np.random.choice(
                    near_idxs, num_points - len(far_idxs), replace=False)
                choice = np.concatenate((near_choice, far_idxs), axis=0)
            else:
                choice = np.arange(len(points))
                choice = np.random.choice(choice, num_points, replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(len(points))
            if num_points > len(points):
                extra = np.random.choice(choice, num_points - len(points))
                choice = np.concatenate((choice, extra), axis=0)
            np.random.shuffle(choice)
        data_dict['points'] = points[choice]
        return data_dict

    def pad_points(self, data_dict):
        """Fixed-capacity padding (framework-specific, not in reference)."""
        if self.max_points is None:
            return data_dict
        points = data_dict['points']
        n = min(len(points), self.max_points)
        out = np.zeros((self.max_points, points.shape[1]), np.float32)
        out[:n] = points[:n]
        data_dict['points'] = out
        data_dict['num_points'] = np.int32(n)
        return data_dict

    def forward(self, data_dict):
        for cur_processor in self.data_processor_queue:
            data_dict = cur_processor(data_dict)
        return self.pad_points(data_dict)
