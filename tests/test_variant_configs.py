"""Variant configs (pointrcnn_iou, second_multihead, PartA2_free) build and
run one training step on synthetic data."""

import jax
import numpy as np
import pytest

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets import build_dataloader
from lidardetection_tpu.models import build_network
from lidardetection_tpu.parallel.train_step import (
    TrainState, device_batch, make_train_step,
)
from lidardetection_tpu.utils.optimization import build_optimizer


def shrink(c):
    c.MODEL.COMPUTE_DTYPE = 'float32'
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    if 'DATA_AUGMENTOR' in c.DATA_CONFIG:
        del c.DATA_CONFIG.DATA_AUGMENTOR
    c.DATA_CONFIG.MAX_POINTS = 2048
    pillar = c.MODEL.get('MAP_TO_BEV', {}).get('NAME') == 'PointPillarScatter'
    pcr = c.DATA_CONFIG.POINT_CLOUD_RANGE
    z_extent = float(pcr[5] - pcr[2])
    # grid dims must stay divisible by the BEV backbone's total stride so
    # stride-2 convs round-trip with the x2 upsamples (real grids are even;
    # e.g. the livox 95.5 m x-extent / 0.2 would give an odd 478-wide grid)
    vx = (pcr[3] - pcr[0]) / 64.0
    vy = (pcr[4] - pcr[1]) / 64.0
    for p in c.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 1000, 'test': 1000}
            # pillar models need nz == 1 (full z extent in one voxel)
            p.VOXEL_SIZE = [vx, vy, z_extent if pillar else 0.1]
        if p.NAME == 'sample_points':
            p.NUM_POINTS = {'train': 2048, 'test': 2048}
    if 'BACKBONE_3D' in c.MODEL and c.MODEL.BACKBONE_3D.NAME == 'PointNet2MSG':
        c.MODEL.BACKBONE_3D.SA_CONFIG.NPOINTS = [256, 64, 16, 8]
    if 'ROI_HEAD' in c.MODEL:
        rh = c.MODEL.ROI_HEAD
        for phase in ('TRAIN', 'TEST'):
            rh.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 256
            rh.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 32
        rh.TARGET_CONFIG.ROI_PER_IMAGE = 16
        if 'ROI_AWARE_POOL' in rh:
            rh.ROI_AWARE_POOL.POOL_SIZE = 6
        if 'ROI_POINT_POOL' in rh:
            rh.ROI_POINT_POOL.NUM_SAMPLED_POINTS = 64
        if 'SA_CONFIG' in rh:
            rh.SA_CONFIG.NPOINTS = [32, 16, -1]
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 128
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    return c


@pytest.mark.parametrize('cfg_file', [
    'tools/cfgs/kitti_models/pointrcnn_iou.yaml',
    'tools/cfgs/kitti_models/second_multihead.yaml',
    'tools/cfgs/kitti_models/PartA2_free.yaml',
    'tools/cfgs/livox_models/pointpillar.yaml',
    'tools/cfgs/livox_models/pv_rcnn.yaml',
    'tools/cfgs/mix_data_models/pointpillars_xy.yaml',
    'tools/cfgs/mix_data_models/pv_rcnn_xy.yaml',
    'tools/cfgs/nuscenes_models/cbgs_second_multihead.yaml',
])
def test_variant_one_train_step(cfg_file):
    cfg = shrink(cfg_from_yaml_file(cfg_file))
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True,
        num_scenes=1)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), device_batch(batch),
                           training=False)
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 2)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    step = make_train_step(model)
    state, tb = step(state, device_batch(batch))
    assert np.isfinite(float(tb['loss'])), cfg_file
