"""Part-A² (UNet + intra-part head + RoI-aware head) e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets import build_dataloader
from lidardetection_tpu.models import build_network
from lidardetection_tpu.parallel.train_step import (
    TrainState, device_batch, make_eval_step, make_train_step,
)
from lidardetection_tpu.utils.optimization import build_optimizer

CFG_FILE = 'tools/cfgs/kitti_models/PartA2.yaml'


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file(CFG_FILE)
    c.DATA_CONFIG.MAX_POINTS = 4000
    c.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {'train': 1200, 'test': 1200}
    c.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.2, 0.2, 0.1]
    c.MODEL.COMPUTE_DTYPE = 'float32'
    c.MODEL.ROI_HEAD.NMS_CONFIG.TRAIN.NMS_PRE_MAXSIZE = 512
    c.MODEL.ROI_HEAD.NMS_CONFIG.TRAIN.NMS_POST_MAXSIZE = 64
    c.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_PRE_MAXSIZE = 256
    c.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE = 32
    c.MODEL.ROI_HEAD.TARGET_CONFIG.ROI_PER_IMAGE = 16
    c.MODEL.ROI_HEAD.ROI_AWARE_POOL.POOL_SIZE = 6
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 64
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR
    return c


@pytest.fixture(scope='module')
def setup(cfg):
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True,
        num_scenes=2)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), device_batch(batch),
                           training=False)
    return dataset, batch, model, variables


def test_eval_forward(cfg, setup):
    dataset, batch, model, variables = setup
    out = model.apply(variables, device_batch(batch), training=False)
    # UNet decoder restores per-voxel features at conv1 resolution
    assert out['point_features'].shape == (1, 1200, 16)
    assert out['point_part_offset'].shape == (1, 1200, 3)
    assert out['batch_box_preds'].shape == (1, 32, 7)  # TEST NMS_POST_MAXSIZE rois
    # part offsets are sigmoided into [0, 1]
    p = np.asarray(out['point_part_offset'])
    assert p.min() >= 0 and p.max() <= 1


def test_train_step_loss_decreases(cfg, setup):
    dataset, batch, model, variables = setup
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 4)
    fresh = jax.tree.map(jnp.copy, variables)
    state = TrainState.create(fresh['params'], fresh['batch_stats'], tx)
    step = make_train_step(model)
    db = device_batch(batch)
    losses = []
    for _ in range(5):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    assert 'rpn_loss' in tb and 'point_loss_part' in tb and 'rcnn_loss' in tb
    assert losses[-1] < losses[0], losses


def test_eval_step_postprocess(cfg, setup):
    dataset, batch, model, variables = setup
    eval_step = make_eval_step(model, cfg.MODEL.POST_PROCESSING,
                               len(cfg.CLASS_NAMES))
    preds = eval_step(variables['params'], variables['batch_stats'],
                      device_batch(batch))
    assert preds['pred_boxes'].shape == (1, 16, 7)
    assert np.isfinite(np.asarray(preds['pred_scores'])).all()
