"""SECOND (sparse backbone) end-to-end on synthetic scenes."""

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

CFG_FILE = 'tools/cfgs/kitti_models/second.yaml'


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file(CFG_FILE)
    c.DATA_CONFIG.MAX_POINTS = 8000
    c.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {'train': 2000, 'test': 2000}
    # shrink the BEV grid for CPU but keep nz=40 (the z-compression
    # stack needs the full KITTI depth): grid 352x400x40
    c.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.2, 0.2, 0.1]
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 256
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 32
    c.MODEL.COMPUTE_DTYPE = 'float32'
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


def test_forward_shapes(cfg, setup):
    dataset, batch, model, variables = setup
    out = model.apply(variables, device_batch(batch), training=False)
    # grid 352x400x40 -> sparse D=41 -> z chain 41/21/11/5/2, stride-8
    assert out['encoded_spconv_tensor'].shape == (1, 2, 50, 44, 128)
    assert out['spatial_features'].shape == (1, 50, 44, 256)
    nc, code, nd = out['head_raw_sizes']
    assert out['batch_fused_preds'].shape == (1, 50, 44, 6 * (nc + code + nd))


def test_train_step_loss_decreases(cfg, setup):
    dataset, batch, model, variables = setup
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 2)
    import jax.numpy as jnp
    fresh = jax.tree.map(jnp.copy, variables)
    state = TrainState.create(fresh['params'], fresh['batch_stats'], tx)
    step = make_train_step(model)
    db = device_batch(batch)
    losses = []
    for _ in range(6):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
