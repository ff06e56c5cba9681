"""End-to-end PointPillar slice: dataset -> model -> loss -> train step -> post-processing."""

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

CFG_FILE = 'tools/cfgs/kitti_models/pointpillar.yaml'


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file(CFG_FILE)
    # shrink capacities for CPU test speed
    c.DATA_CONFIG.MAX_POINTS = 20000
    c.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {'train': 4000, 'test': 4000}
    # 2x voxel size -> 248x216 BEV canvas (4x less CPU conv work; the full
    # 496x432 canvas made the train test alone cost ~150 s)
    c.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.32, 0.32, 4]
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 512
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 64
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR  # synthetic scenes need no gt sampling
    return c


@pytest.fixture(scope='module')
def data(cfg):
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
        num_scenes=4)
    batch = next(iter(loader))
    return dataset, loader, batch


@pytest.fixture(scope='module')
def model_and_vars(cfg, data):
    dataset, _, batch = data
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), device_batch(batch), training=False)
    return model, variables


def test_batch_shapes(cfg, data):
    dataset, _, batch = data
    assert batch['voxels'].shape == (2, 4000, 32, 4)
    assert batch['voxel_coords'].shape == (2, 4000, 3)
    assert batch['gt_boxes'].shape == (2, 64, 8)
    assert batch['voxels'].dtype == np.float32
    # coords are (z, y, x) within the pillar grid
    valid = batch['voxel_coords'][batch['voxel_coords'][..., 0] >= 0]
    assert valid[:, 1].max() < 248 and valid[:, 2].max() < 216


def test_forward_shapes(cfg, data, model_and_vars):
    dataset, _, batch = data
    model, variables = model_and_vars
    out = model.apply(variables, device_batch(batch), training=False)
    assert out['spatial_features'].shape == (2, 248, 216, 64)
    assert out['spatial_features_2d'].shape == (2, 124, 108, 384)
    a = 124 * 108 * 6
    # single-stage eval defers box decode to post_processing (top-k rows
    # only): raw preds stay BEV-native, anchors reconstructed from idx
    nc, code, nd = out['head_raw_sizes']
    assert (nc, code, nd) == (3, 7, 2)
    assert out['head_layout'] == (124, 108, 6)
    assert out['batch_fused_preds'].shape == (2, 124, 108, 6 * (nc + code + nd))
    idx = jnp.asarray(
        np.random.RandomState(0).randint(0, a, (2, 8)).astype(np.int32))
    anchors = out['anchor_from_idx'](idx)
    assert anchors.shape == (2, 8, 7)
    # arithmetic reconstruction must match the dense anchor table exactly
    from lidardetection_tpu.models.dense_heads.anchor_head import (
        build_head_anchors,
    )
    info = build_head_anchors(cfg.MODEL.DENSE_HEAD, dataset.grid_size,
                              cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                              len(cfg.CLASS_NAMES))
    np.testing.assert_allclose(np.asarray(anchors),
                               info['flat_anchors'][np.asarray(idx)],
                               rtol=1e-6)
    packed = out['batch_fused_preds'].reshape(2, a, nc + code + nd)
    decoded = out['decode_box_fn'](
        packed[:, :8, nc:nc + code],
        packed[:, :8, nc + code:], anchors)
    assert decoded.shape == (2, 8, 7)


def test_loss_and_grad(cfg, data, model_and_vars):
    _, _, batch = data
    model, variables = model_and_vars
    out, mut = model.apply(variables, device_batch(batch), training=True,
                           mutable=['batch_stats'])
    loss, tb = model.apply(variables, out, method=model.loss)
    assert np.isfinite(float(loss))
    assert float(tb['rpn_loss_cls']) > 0 and float(tb['rpn_loss_loc']) >= 0
    # positives exist: the synthetic scenes have matched anchors
    labels = out['anchor_head_fwd']['box_cls_labels']
    assert int((labels > 0).sum()) > 0
    assert int((labels == -1).sum()) > 0  # some ignored


def test_train_step_reduces_loss(cfg, data, model_and_vars):
    _, _, batch = data
    model, variables = model_and_vars
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_iters_each_epoch=10,
                            total_epochs=2)
    # copy: the train step donates its input state, and `variables` is a
    # module-scoped fixture reused by the eval test
    fresh = jax.tree.map(jnp.copy, variables)
    state = TrainState.create(params=fresh['params'],
                              batch_stats=fresh['batch_stats'], tx=tx)
    step = make_train_step(model)
    db = device_batch(batch)
    losses = []
    for _ in range(8):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_eval_step_and_postprocess(cfg, data, model_and_vars):
    _, _, batch = data
    model, variables = model_and_vars
    eval_step = make_eval_step(model, cfg.MODEL.POST_PROCESSING,
                               len(cfg.CLASS_NAMES))
    preds = eval_step(variables['params'], variables['batch_stats'],
                      device_batch(batch))
    assert preds['pred_boxes'].shape == (2, 64, 7)
    assert preds['pred_labels'].shape == (2, 64)
    assert preds['recall']['gt'] > 0
    # untrained net: predictions exist but recall may be 0; just check finite
    assert np.isfinite(np.asarray(preds['pred_scores'])).all()
