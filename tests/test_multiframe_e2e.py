"""Multiframe PV-RCNN (fork extension) e2e: per-frame point labels,
multiframe-enlarged anchor gt, tracking regression targets."""

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

CFG_FILE = 'tools/cfgs/livox_models/pv_rcnn_multiframe.yaml'


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file(CFG_FILE)
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR
    c.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -16, -2, 64, 16, 6]
    c.DATA_CONFIG.MAX_POINTS = 3000
    c.DATA_CONFIG.DATA_PROCESSOR[1].NUM_POINTS = {'train': 3000, 'test': 3000}
    c.DATA_CONFIG.DATA_PROCESSOR[3].MAX_NUMBER_OF_VOXELS = {'train': 1200, 'test': 1200}
    c.DATA_CONFIG.DATA_PROCESSOR[3].VOXEL_SIZE = [0.2, 0.2, 0.2]
    # Synthetic classes
    c.CLASS_NAMES = ['Car', 'Pedestrian']
    c.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[1].class_name = 'Pedestrian'
    c.MODEL.COMPUTE_DTYPE = 'float32'
    c.MODEL.PFE.NUM_KEYPOINTS = 256
    rh = c.MODEL.ROI_HEAD
    rh.NMS_CONFIG.TRAIN.NMS_PRE_MAXSIZE = 256
    rh.NMS_CONFIG.TRAIN.NMS_POST_MAXSIZE = 64
    rh.TARGET_CONFIG.ROI_PER_IMAGE = 16
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 64
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    return c


def test_multiframe_train_step(cfg):
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True,
        num_scenes=1)
    batch = next(iter(loader))
    # multiframe side arrays are present and padded
    assert batch['locations'].shape == (1, 64, 3, 3)
    assert batch['rotations_y'].shape == (1, 64, 3)
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    db = device_batch(batch)
    assert 'locations' in db
    variables = model.init(jax.random.PRNGKey(0), db, training=False)
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 2)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    step = make_train_step(model)
    losses = []
    for _ in range(3):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    # all three stage losses present; rcnn reg covers tracking targets (+8)
    assert 'point_loss_cls' in tb and 'rcnn_loss' in tb and 'rpn_loss' in tb


def test_multiframe_enlarged_gt():
    import jax.numpy as jnp

    from lidardetection_tpu.models.dense_heads.anchor_head import (
        compute_multiframe_enlarged_gt,
    )
    gt = np.zeros((1, 1, 8), np.float32)
    gt[0, 0] = [10, 0, 0, 4, 2, 2, 0, 1]
    # object moved 6m along x over 3 frames -> swept length 4 + 6 = 10
    loc = np.zeros((1, 1, 3, 3), np.float32)
    loc[0, 0] = [[4, 0, 0], [7, 0, 0], [10, 0, 0]]
    rot = np.zeros((1, 1, 3), np.float32)
    out = np.asarray(compute_multiframe_enlarged_gt(
        jnp.asarray(gt), jnp.asarray(loc), jnp.asarray(rot)))
    np.testing.assert_allclose(out[0, 0, 3], 10.0, atol=1e-4)  # enlarged dx
    np.testing.assert_allclose(out[0, 0, 4], 2.0, atol=1e-4)   # dy unchanged
    np.testing.assert_allclose(out[0, 0, 0:3], [10, 0, 0], atol=1e-5)
