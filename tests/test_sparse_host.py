"""Host rulebook builders (C++ / numpy) vs the device builders.

The host chain (ops/sparse_plan.py + native/rulebooks.cpp) must reproduce
ops/sparse.py's tables bit-for-bit: same sorted output coords, same row
indices, same miss sentinel — the Pallas conv kernel's monotone-column
contract rides on it.
"""

import numpy as np
import pytest

from lidardetection_tpu import native
from lidardetection_tpu.ops import sparse, sparse_plan


def _random_table(rng, cap, n, shape):
    d, h, w = shape
    keys = rng.choice(d * h * w, size=n, replace=False)
    keys = np.sort(keys)
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n, 0] = keys // (h * w)
    coords[:n, 1] = (keys // w) % h
    coords[:n, 2] = keys % w
    return coords


def _device_reference(plan, coords, n):
    """Walk the plan with the jax builders from ops/sparse.py."""
    import jax.numpy as jnp

    out = {}
    tables = [(coords, n, plan.spatial_shape)]
    op_in, op_out = [], []
    cur = 0
    for op in plan.ops:
        op_in.append(cur)
        c, nn, shape = tables[cur]
        st = sparse.SparseTensor(
            jnp.zeros((1, c.shape[0], 1)), jnp.asarray(c)[None],
            jnp.asarray([nn]), shape)
        if op.type == 'subm':
            out[f'rb_{op.name}'] = np.asarray(
                sparse.build_subm_rulebook(st, op.kernel))[0]
        elif op.type == 'down':
            oc, onum, oshape = sparse.build_strided_out_coords(
                st, op.kernel, op.stride, op.padding, op.out_cap)
            rb = sparse.build_strided_rulebook(
                st, oc, oshape, op.kernel, op.stride, op.padding)
            out[f'rb_{op.name}'] = np.asarray(rb)[0]
            out[f'rb_{op.name}_coords'] = np.asarray(oc)[0]
            out[f'rb_{op.name}_num'] = int(onum[0])
            tables.append((np.asarray(oc)[0], int(onum[0]), oshape))
            cur = len(tables) - 1
        elif op.type == 'inv':
            m = plan.ops[op.match]
            up = op_in[op.match]
            uc, _un, ushape = tables[up]
            rb = sparse.build_inverse_rulebook(
                st, jnp.asarray(uc)[None], ushape, m.kernel, m.stride,
                m.padding)
            out[f'rb_{op.name}'] = np.asarray(rb)[0]
            cur = up
        else:  # rewind
            cur = op_out[op.match]
        op_out.append(cur)
    return out


CASES = [
    ('VoxelBackBone8x', (44, 40, 5), 600, 400),
    ('UNetV2', (44, 40, 5), 600, 400),
]


@pytest.mark.parametrize('name,grid,cap,n', CASES)
def test_host_matches_device(name, grid, cap, n):
    rng = np.random.default_rng(0)
    cfg = {'BACKBONE_3D': {'NAME': name,
                           'OUT_CAPACITIES': [cap, cap, cap // 2, cap // 2]}}
    plan = sparse_plan.backbone_plan(cfg, grid, cap)
    assert plan is not None
    coords = _random_table(rng, cap, n, plan.spatial_shape)

    ref = _device_reference(plan, coords, n)
    host = sparse_plan.build_host_rulebooks(plan, coords, n)

    assert set(host) == set(ref)
    for key in ref:
        np.testing.assert_array_equal(host[key], ref[key], err_msg=key)


def test_numpy_twin_matches_native():
    if native.load() is None:
        pytest.skip('no native toolchain')
    rng = np.random.default_rng(1)
    cfg = {'BACKBONE_3D': {'NAME': 'UNetV2'}}
    plan = sparse_plan.backbone_plan(cfg, (32, 32, 4), 500)
    coords = _random_table(rng, 500, 333, plan.spatial_shape)
    a = sparse_plan.build_host_rulebooks(plan, coords, 333)
    rb, oc, on = sparse_plan._build_rulebooks_np(plan, coords, 333)
    # re-slice the numpy buffers through the same layout
    import unittest.mock as mock
    with mock.patch.object(native, 'load', return_value=None):
        b = sparse_plan.build_host_rulebooks(plan, coords, 333)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_second_e2e_host_vs_device_rulebooks():
    """SECOND forward with host-shipped rulebooks == on-device builds."""
    import jax

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.train_step import device_batch

    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/second.yaml')
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 1500  # points array cap only
    del cfg.DATA_CONFIG.DATA_AUGMENTOR
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            # capacity above the synthetic occupancy (~8.3k cells at
            # 4x voxels) so bucketing has headroom to truncate
            p.MAX_NUMBER_OF_VOXELS = {'train': 12288, 'test': 12288}
            vs = p.VOXEL_SIZE
            # keep z resolution: the conv chain needs D >= 42 to keep the
            # stride-8 z-compression non-degenerate
            p.VOXEL_SIZE = [vs[0] * 4, vs[1] * 4, vs[2]]
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 128
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False,
        num_scenes=2, model_cfg=cfg.MODEL)
    assert dataset.sparse_plan is not None
    batch = next(iter(loader))
    rb_keys = [k for k in batch if k.startswith('rb_')]
    assert rb_keys, 'host rulebooks missing from the batch'

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    db_host = device_batch(batch)
    assert any(k.startswith('rb_') for k in db_host), \
        'device_batch dropped the host rulebooks'
    db_dev = {k: v for k, v in db_host.items() if not k.startswith('rb_')}
    variables = model.init(jax.random.PRNGKey(0), db_dev, training=False)

    out_dev = model.apply(variables, db_dev, training=False)
    # the host-rulebook forward must never fall back to device builders
    import unittest.mock as mock
    with mock.patch.object(sparse, 'build_subm_rulebook',
                           side_effect=AssertionError('device build used')), \
         mock.patch.object(sparse, 'build_strided_out_coords',
                           side_effect=AssertionError('device build used')):
        out_host = model.apply(variables, db_host, training=False)
    np.testing.assert_allclose(
        np.asarray(out_host['encoded_spconv_tensor']),
        np.asarray(out_dev['encoded_spconv_tensor']), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_host['batch_fused_preds']),
        np.asarray(out_dev['batch_fused_preds']), rtol=1e-4, atol=1e-4)

    # occupancy bucketing through the real loader (fine granularity so the
    # tables actually truncate) is lossless: same dense outputs
    from lidardetection_tpu.datasets import DataLoader

    bloader = DataLoader(dataset, batch_size=2, shuffle=False,
                         drop_last=False, bucket_voxels=True,
                         bucket_granularity=64)
    bbatch = next(iter(bloader))
    assert bbatch['voxels'].shape[1] < batch['voxels'].shape[1]
    out_b = model.apply(variables, device_batch(bbatch), training=False)
    np.testing.assert_allclose(
        np.asarray(out_b['batch_fused_preds']),
        np.asarray(out_host['batch_fused_preds']), rtol=1e-4, atol=1e-4)


def test_bucketing_preserves_rulebook_semantics():
    """Occupancy bucketing (slice rows, clamp values) must keep every
    valid rulebook entry and map miss exactly to the new capacity."""
    rng = np.random.default_rng(3)
    cap, n = 512, 100
    cfg = {'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'}}
    plan = sparse_plan.backbone_plan(cfg, (44, 40, 5), cap)
    coords = _random_table(rng, cap, n, plan.spatial_shape)
    host = sparse_plan.build_host_rulebooks(plan, coords, n)

    g = 128
    stages, rows, values = plan.bucket_spec()
    num_of = {'num_voxels': n}
    for num_key, _cap in stages[1:]:
        num_of[num_key] = int(host[num_key])
    mstage = [min(-(-max(1, num_of[k]) // g) * g, c) for k, c in stages]

    bucketed = {k: (v[:, :] if v.ndim else v).copy() for k, v in host.items()}
    for key, s in rows:
        if bucketed[key].ndim and mstage[s] < bucketed[key].shape[0]:
            bucketed[key] = bucketed[key][:mstage[s]]
    for key, s in values:
        bucketed[key] = np.minimum(bucketed[key], mstage[s])

    for key, s in values:
        full = host[key]
        cut = bucketed[key]
        rows_kept = cut.shape[0]
        # valid entries unchanged, misses remapped to the new capacity
        valid = full[:rows_kept] < num_of[stages[s][0]]
        np.testing.assert_array_equal(cut[valid], full[:rows_kept][valid])
        assert (cut[~valid] == mstage[s]).all()
        # dropped rows were all-miss (padding outputs)
        row_stage = dict(rows)[key]
        assert (full[rows_kept:] >= num_of[stages[s][0]]).all(), key
        assert rows_kept >= num_of[stages[row_stage][0]], key


def test_capacity_overflow_truncates_consistently():
    """When a down stage overflows its capacity both builders keep the
    lowest-key voxels (the device sort+unique truncation)."""
    rng = np.random.default_rng(2)
    cfg = {'BACKBONE_3D': {'NAME': 'VoxelBackBone8x',
                           'OUT_CAPACITIES': [64, 32, 16, 8]}}
    plan = sparse_plan.backbone_plan(cfg, (24, 24, 3), 300)
    coords = _random_table(rng, 300, 280, plan.spatial_shape)
    ref = _device_reference(plan, coords, 280)
    host = sparse_plan.build_host_rulebooks(plan, coords, 280)
    for key in ref:
        np.testing.assert_array_equal(host[key], ref[key], err_msg=key)
