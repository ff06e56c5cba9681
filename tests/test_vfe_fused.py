"""PillarVFE fused eval path: decomposition + Pallas kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets import build_dataloader
from lidardetection_tpu.models import build_network
from lidardetection_tpu.ops.vfe_tpu import pillar_vfe_fused
from lidardetection_tpu.parallel.train_step import device_batch


def _ref_vfe(voxels, npts, kernel, inv, shift, cdt):
    """Reference eval math: mask -> aug -> linear -> affine -> relu -> max."""
    b, v, p, _ = voxels.shape
    denom = np.clip(npts.astype(np.float32), 1.0, None)[..., None, None]
    mean = voxels[..., :3].sum(axis=2, keepdims=True) / denom
    # centers chosen arbitrarily by the caller via voxel grid; emulate with
    # the same grid math as the module under test
    return mean


def test_decomposition_matches_full_math():
    """Fast-path eval (XLA branch) == naive aug @ K -> affine -> relu -> max
    with the same running stats."""
    rng = np.random.RandomState(0)
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 8000
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {
        'train': 1500, 'test': 1500}
    del cfg.DATA_CONFIG.DATA_AUGMENTOR
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False,
        num_scenes=2)
    batch = device_batch(next(iter(loader)))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    # randomize stats/params so the affine is non-trivial
    params = variables['params']
    stats = variables['batch_stats']
    vfe_p = dict(params['vfe'])
    assert 'pfn_kernel' in vfe_p, 'fast path params missing'
    vfe_p['pfn_bn_scale'] = jnp.asarray(rng.uniform(0.5, 2, 64), jnp.float32)
    vfe_p['pfn_bn_bias'] = jnp.asarray(rng.randn(64) * 0.2, jnp.float32)
    params = {**params, 'vfe': vfe_p}
    vfe_s = dict(stats['vfe'])
    vfe_s['pfn_mean'] = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    vfe_s['pfn_var'] = jnp.asarray(rng.uniform(0.5, 2, 64), jnp.float32)
    stats = {**stats, 'vfe': vfe_s}

    out = model.apply({'params': params, 'batch_stats': stats}, batch,
                      training=False)
    got = out['pillar_features']  # (B, V, 64)

    # naive reference
    voxels = np.asarray(batch['voxels'], np.float32)
    npts = np.asarray(batch['voxel_num_points'])
    coords = np.asarray(batch['voxel_coords'])
    b, v, p, _ = voxels.shape
    vx, vy, vz = (0.16, 0.16, 4.0)
    pcr = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    cx = coords[..., 2:3] * vx + vx / 2 + pcr[0]
    cy = coords[..., 1:2] * vy + vy / 2 + pcr[1]
    cz = coords[..., 0:1] * vz + vz / 2 + pcr[2]
    denom = np.clip(npts, 1, None)[..., None, None].astype(np.float32)
    mean = voxels[..., :3].sum(2, keepdims=True) / denom
    f_cluster = voxels[..., :3] - mean
    f_center = np.stack([voxels[..., 0] - cx[..., None, 0],
                         voxels[..., 1] - cy[..., None, 0],
                         voxels[..., 2] - cz[..., None, 0]], axis=-1)
    aug = np.concatenate([voxels, f_cluster, f_center], -1)
    pmask = (np.arange(p)[None, None] < npts[..., None]) \
        & (npts > 0)[..., None]
    aug = aug * pmask[..., None]
    K = np.asarray(params['vfe']['pfn_kernel'], np.float32)
    z = aug.astype(np.float32) @ K
    inv = np.asarray(vfe_p['pfn_bn_scale']) / np.sqrt(
        np.asarray(vfe_s['pfn_var']) + 1e-3)
    shift = np.asarray(vfe_p['pfn_bn_bias']) \
        - np.asarray(vfe_s['pfn_mean']) * inv
    z = np.maximum(z * inv + shift, 0.0)
    want = z.max(axis=2) * (npts > 0)[..., None]

    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0.05, atol=0.05)  # bf16 path tolerance


def test_pallas_kernel_interpret_matches_xla():
    """pillar_vfe_fused (interpret mode) == the XLA decomposition."""
    rng = np.random.RandomState(1)
    b, v, p, c = 2, 600, 16, 64
    vox = rng.randn(b, v, p, 4).astype(np.float32)
    counts = rng.randint(0, p + 1, (b, v)).astype(np.int32)
    rows = np.arange(p)[None, None, :]
    vox = vox * (rows < counts[..., None])[..., None]
    ctr = np.concatenate([rng.randn(b, v, 3), np.zeros((b, v, 1))],
                         -1).astype(np.float32)
    pb = (rng.randn(b, v, c) * 0.1).astype(np.float32)
    w4 = (rng.randn(4, c) * 0.2).astype(np.float32)
    shift = (rng.randn(c) * 0.1).astype(np.float32)

    got = pillar_vfe_fused(jnp.asarray(vox), jnp.asarray(ctr),
                           jnp.asarray(pb), jnp.asarray(counts),
                           jnp.asarray(w4), jnp.asarray(shift),
                           out_dtype=jnp.float32, interpret=True)

    xc = vox - ctr[:, :, None, :]
    z = xc.astype(jnp.bfloat16) @ jnp.asarray(w4, jnp.bfloat16)
    z = np.asarray(z, np.float32) + pb[:, :, None]
    z = np.where((rows < counts[..., None])[..., None], z, -np.inf)
    m = z.max(axis=2)
    pad = np.where((counts < p)[..., None], shift[None, None], -np.inf)
    want = np.maximum(np.maximum(m, pad), 0.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)
