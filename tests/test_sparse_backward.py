"""Kernel-accelerated sparse-conv training backward.

Pins, in interpret mode on CPU, that the transposed-rulebook backward
matches jax.grad of the XLA reference convolution:
  * dW via ops/sparse_conv_tpu.rulebook_conv_dw_pallas
  * df via the forward kernel over the offset-flipped rulebook (subm)
  * df via the plan's transposed rulebook (down convs)
and that training plans emit consistent rb_<down>_bwd tables
(rb_bwd[i, k] = o  <=>  rb[o, k] = i).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.ops import sparse, sparse_conv_tpu, sparse_plan


def make_table(rng, n, shape):
    d, h, w = shape
    keys = rng.choice(d * h * w, size=n, replace=False)
    keys.sort()
    coords = np.stack([keys // (h * w), (keys // w) % h, keys % w],
                      axis=1).astype(np.int32)
    return coords


def subm_case(rng, b=2, cap=96, n=80, shape=(5, 9, 9)):
    coords = np.full((b, cap, 3), -1, np.int32)
    nums = []
    for bi in range(b):
        nn = n - 7 * bi
        coords[bi, :nn] = make_table(rng, nn, shape)
        nums.append(nn)
    st = sparse.SparseTensor(
        jnp.zeros((b, cap, 1)), jnp.asarray(coords),
        jnp.asarray(nums, jnp.int32), shape)
    rb = sparse.build_subm_rulebook(st, (3, 3, 3))
    return st, rb


def test_dw_kernel_matches_xla_grad():
    rng = np.random.default_rng(0)
    st, rb = subm_case(rng)
    b, cap = st.coords.shape[:2]
    ci, co = 8, 16
    f = jnp.asarray(rng.standard_normal((b, cap, ci)), jnp.float32)
    f = f * st.valid_mask[..., None]
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, cap, co)), jnp.float32)
    g = g * st.valid_mask[..., None]

    dw = sparse_conv_tpu.rulebook_conv_dw_pallas(
        f, rb, g, kernel_z=3, t_out=32, blk=16, n_wg=4, interpret=True)

    def loss(w2):
        out = sparse._conv_apply_xla(f, st.valid_mask, rb, w2)
        return jnp.sum(out * g)

    dw_ref = jax.grad(loss)(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_subm_flip_df_matches_xla_grad():
    rng = np.random.default_rng(1)
    st, rb = subm_case(rng)
    b, cap = st.coords.shape[:2]
    ci, co = 8, 16
    f = jnp.asarray(rng.standard_normal((b, cap, ci)), jnp.float32)
    f = f * st.valid_mask[..., None]
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, cap, co)), jnp.float32)
    g = g * st.valid_mask[..., None]

    # df[i] = sum_k W[K-1-k]^T-applied g[rb[i, k]]: the shared-table
    # involution rb[i, k] = o <=> rb[o, K-1-k] = i means the gather reuses
    # the forward rulebook array and only the WEIGHTS flip
    wb = jnp.swapaxes(jnp.flip(w, axis=0), 1, 2)
    df = sparse_conv_tpu.rulebook_conv_pallas_v3(
        g, rb, wb, kernel_z=3, t_out=32, blk=16, n_wg=4, interpret=True)
    df = df * st.valid_mask[..., None]

    def loss(f2):
        out = sparse._conv_apply_xla(f2, st.valid_mask, rb, w)
        return jnp.sum(out * g)

    df_ref = jax.grad(loss)(f)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-4, atol=1e-4)


def _tiny_plan(training):
    cfg = {'BACKBONE_3D': {'NAME': 'VoxelBackBone8x',
                           'OUT_CAPACITIES': [64, 48, 32, 24]}}
    return sparse_plan.backbone_plan(cfg, (16, 16, 4), 96, training=training)


def test_training_plan_emits_transposed_rulebooks():
    plan = _tiny_plan(training=True)
    keys = plan.batch_keys()
    for name in ('down2', 'down3', 'down4', 'out'):
        assert f'rb_{name}_bwd' in keys, keys
    # eval plan unchanged
    assert not any(k.endswith('_bwd') for k in
                   _tiny_plan(training=False).batch_keys())

    rng = np.random.default_rng(2)
    coords = np.full((96, 3), -1, np.int32)
    coords[:70] = make_table(rng, 70, (5, 16, 16))
    rbs = sparse_plan._build_rulebooks_np(plan, coords, 70)
    out = {}
    off = 0
    shapes = sparse_plan._op_shapes(plan)
    rb_buf = rbs[0]
    for op, (rows, k, is_down, _c) in zip(plan.ops, shapes):
        if op.type == 'rewind':
            continue
        out[f'rb_{op.name}'] = rb_buf[off:off + rows * k].reshape(rows, k)
        off += rows * k

    # transposed-rulebook involution: rb_bwd[i, k] = o <=> rb[o, k] = i
    for name, vo_cap, vi_cap in (('down2', 64, 96), ('down3', 48, 64),
                                 ('down4', 32, 48), ('out', 24, 32)):
        rb = out[f'rb_{name}']
        rbb = out[f'rb_{name}_bwd']
        assert rb.shape[1] == rbb.shape[1]
        for k in range(rb.shape[1]):
            for o in range(rb.shape[0]):
                i = rb[o, k]
                if i < vi_cap:
                    assert rbb[i, k] == o, (name, k, o, i)
            for i in range(rbb.shape[0]):
                o = rbb[i, k]
                if o < vo_cap:
                    assert rb[o, k] == i, (name, k, i, o)


def test_down_conv_bwd_rulebook_df():
    """df of a strided conv through the plan's transposed rulebook."""
    rng = np.random.default_rng(3)
    plan = _tiny_plan(training=True)
    coords = np.full((96, 3), -1, np.int32)
    coords[:70] = make_table(rng, 70, (5, 16, 16))
    host = sparse_plan.build_host_rulebooks(plan, coords, 70)

    rb = jnp.asarray(host['rb_down2'])[None]      # (1, 64, 27) into V=96
    rbb = jnp.asarray(host['rb_down2_bwd'])[None]  # (1, 96, 27) into Vo=64
    out_valid = jnp.asarray(host['rb_down2_coords'][:, 0] >= 0)[None]
    in_valid = jnp.asarray(coords[:, 0] >= 0)[None]

    ci, co = 8, 8
    f = jnp.asarray(rng.standard_normal((1, 96, ci)), jnp.float32)
    f = f * in_valid[..., None]
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 64, co)), jnp.float32)
    g = g * out_valid[..., None]

    wb = jnp.swapaxes(w, 1, 2)  # offset index preserved for plan rulebooks
    df = sparse_conv_tpu.rulebook_conv_pallas_v3(
        g, rbb, wb, kernel_z=3, t_out=32, blk=16, n_wg=4, interpret=True)
    df = df * in_valid[..., None]

    def loss(f2):
        out = sparse._conv_apply_xla(f2, out_valid, rb, w)
        return jnp.sum(out * g)

    df_ref = jax.grad(loss)(f)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-4, atol=1e-4)
