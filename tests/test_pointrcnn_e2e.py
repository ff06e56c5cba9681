"""PointRCNN (point backbone + point head + RoI head) e2e on synthetic scenes."""

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

CFG_FILE = 'tools/cfgs/kitti_models/pointrcnn.yaml'


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file(CFG_FILE)
    # shrink everything for CPU
    c.DATA_CONFIG.MAX_POINTS = 1024
    c.DATA_CONFIG.DATA_PROCESSOR[1].NUM_POINTS = {'train': 1024, 'test': 1024}
    c.MODEL.COMPUTE_DTYPE = 'float32'
    c.MODEL.BACKBONE_3D.SA_CONFIG.NPOINTS = [256, 64, 16, 8]
    c.MODEL.ROI_HEAD.NMS_CONFIG.TRAIN.NMS_PRE_MAXSIZE = 512
    c.MODEL.ROI_HEAD.NMS_CONFIG.TRAIN.NMS_POST_MAXSIZE = 64
    c.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_PRE_MAXSIZE = 512
    c.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE = 32
    c.MODEL.ROI_HEAD.TARGET_CONFIG.ROI_PER_IMAGE = 32
    c.MODEL.ROI_HEAD.ROI_POINT_POOL.NUM_SAMPLED_POINTS = 64
    c.MODEL.ROI_HEAD.SA_CONFIG.NPOINTS = [32, 16, -1]
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 64
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR
    return c


@pytest.fixture(scope='module')
def setup(cfg):
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
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
    assert out['point_features'].shape == (2, 1024, 128)
    # second-stage outputs: per-roi boxes
    assert out['batch_box_preds'].shape == (2, 32, 7)
    assert out['batch_cls_preds'].shape == (2, 32, 1)
    assert bool(out['has_class_labels'])


def test_train_step_loss_decreases(cfg, setup):
    dataset, batch, model, variables = setup
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 4)
    fresh = jax.tree.map(jnp.copy, variables)
    state = TrainState.create(fresh['params'], fresh['batch_stats'], tx)
    step = make_train_step(model)
    db = device_batch(batch)
    losses = []
    for _ in range(6):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    # stages: rpn(point) + rcnn losses all present
    assert 'point_loss_cls' in tb and 'rcnn_loss_cls' in tb
    assert losses[-1] < losses[0], losses


def test_eval_step_postprocess(cfg, setup):
    dataset, batch, model, variables = setup
    eval_step = make_eval_step(model, cfg.MODEL.POST_PROCESSING,
                               len(cfg.CLASS_NAMES))
    preds = eval_step(variables['params'], variables['batch_stats'],
                      device_batch(batch))
    assert preds['pred_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['pred_scores'])).all()
