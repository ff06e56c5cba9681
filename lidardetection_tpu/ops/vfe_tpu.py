"""Fused pillar-VFE eval kernel (Pallas).

The PillarVFE hot loop (pillar_vfe.py:8-123: augment -> Linear -> BN -> ReLU
-> max over points) materializes a (B, V, P, C_out) intermediate — ~1.3 GB
per direction at KITTI eval capacity — that only exists to be max-reduced.
This kernel keeps the per-point activations in VMEM and writes only the
(B, V, C_out) pillar features.

It relies on an exact algebraic refactor of the 10-feature augmentation
(valid at eval, where BN is an affine):

    aug = [xyz, i, xyz - mean, xyz - center]
    aug @ K = xc @ (K_xyz + K_cluster + K_center) + i @ K_i        (per point)
            + center @ K_xyz - (mean - center) @ K_cluster          (per pillar)
    with xc = xyz - center  (small values -> safe to round to bf16; raw xyz
    at ~70 m would lose ~0.25 m to bf16, xc loses < 1 mm)

so the kernel only needs a (4, C) weight, a per-pillar bias row (which also
absorbs the folded BN affine), and the padded-row constant shift (padding
points are zeroed *before* the linear layer, so after BN they contribute
relu(shift) to the max exactly as in the reference).
"""

import functools

import jax
import jax.numpy as jnp

TILE_V = 256  # 512 tips the (T, P, C) f32 intermediates past the 16M scoped-vmem limit


def _vfe_kernel(vox_ref, ctr_ref, pb_ref, cnt_ref, w_ref, shift_ref,
                out_ref):
    v, p, _ = vox_ref.shape[1:]
    c = w_ref.shape[1]
    xc = vox_ref[0] - ctr_ref[0][:, None, :]  # (T, P, 4) f32, centered
    x = xc.astype(w_ref.dtype).reshape(v * p, 4)
    z = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(v, p, c)
    z = z + pb_ref[0][:, None, :]
    cnt = cnt_ref[0, 0][:, None]  # (T, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (v, p), 1)
    # additive f32 mask: Mosaic rejects minor-dim insertion on i1 vectors
    # ("Insertion of minor dim that is not a no-op only supported for
    # 32-bit types"), so avoid broadcasting a bool over the channel dim
    mask = jnp.where(rows < cnt, jnp.float32(0), -jnp.inf)
    z = z + mask[:, :, None]
    m = jnp.max(z, axis=1)  # (T, C)
    # padding rows (present iff cnt < P; all rows when cnt == 0) contribute
    # the BN shift, exactly like zeroed inputs through linear+BN
    pad_val = jnp.where(cnt < p, shift_ref[0][None, :], -jnp.inf)
    out_ref[0] = jax.nn.relu(jnp.maximum(m, pad_val)).astype(out_ref.dtype)


def _vfe_bd_kernel(x_ref, pb_ref, cnt_ref, w_ref, shift_ref, out_ref, *, p, c):
    t = x_ref.shape[1]
    # one MXU matmul per tile: (T, P*4) @ (P*4, P*C) block-diagonal weight.
    # The K=4-per-point contraction is repacked so lanes are fully used
    # (P*4 = 128 for the standard 32-point pillar) instead of a (T*P, 4)
    # reshape whose Mosaic relayout dominated runtime (~52 ms/batch -> ~1 ms).
    z = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, P*C)
    cnt = cnt_ref[0, 0][:, None]  # (T, 1) int32
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (t, p * c), 1) // c
    z = z + jnp.where(lane_p < cnt, jnp.float32(0), -jnp.inf)
    # max over the point dim = tree-reduce over c-sized lane chunks
    width = p * c
    while width > c:
        width //= 2
        z = jnp.maximum(z[:, :width], z[:, width:2 * width])
    m = z + pb_ref[0]  # per-pillar terms are constant over p: add after max
    pad_val = jnp.where(cnt < p, shift_ref[0][None, :], -jnp.inf)
    out_ref[0] = jax.nn.relu(jnp.maximum(m, pad_val)).astype(out_ref.dtype)


def pillar_vfe_fused(vox4, centers, pillar_bias, counts, w4, shift,
                     out_dtype=jnp.bfloat16, interpret=False, tile_v=512):
    """Block-diagonal-matmul variant of the fused pillar VFE (see module
    docstring for the algebra). Requires P a power of two (P*4 lanes packed).
    """
    import jax.experimental.pallas as pl

    b, v, p, f = vox4.shape
    c = w4.shape[1]
    if f != 4 or (p & (p - 1)) != 0:
        return _pillar_vfe_fused_rowwise(vox4, centers, pillar_bias, counts,
                                         w4, shift, out_dtype, interpret)
    # center + cast to bf16 in XLA (fused into one HBM pass); centered
    # coordinates are small so bf16 is safe (raw xyz would lose ~0.25 m)
    xc = (vox4 - centers[:, :, None, :]).astype(jnp.bfloat16)
    xc = xc.reshape(b, v, p * f)
    w_bd = jnp.kron(jnp.eye(p, dtype=jnp.bfloat16),
                    w4.astype(jnp.bfloat16))  # (P*4, P*C)

    pad = (-v) % tile_v
    if pad:
        xc = jnp.pad(xc, ((0, 0), (0, pad), (0, 0)))
        pillar_bias = jnp.pad(pillar_bias, ((0, 0), (0, pad), (0, 0)))
        counts = jnp.pad(counts, ((0, 0), (0, pad)))
    vp = v + pad
    t = vp // tile_v

    out = pl.pallas_call(
        functools.partial(_vfe_bd_kernel, p=p, c=c),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, tile_v, p * f), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, tile_v, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, tile_v), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((p * f, p * c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_v, c), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, vp, c), out_dtype),
        interpret=interpret,
    )(xc, pillar_bias, counts[:, None, :].astype(jnp.int32), w_bd,
      shift.reshape(1, c).astype(jnp.float32))
    return out[:, :v]


def _pillar_vfe_fused_rowwise(vox4, centers, pillar_bias, counts, w4, shift,
                              out_dtype=jnp.bfloat16, interpret=False):
    """relu(max_p(BN(aug(vox) @ K))) without materializing the point dim.

    Args:
        vox4 (B, V, P, 4) f32: raw [xyz, intensity] (padding rows zeroed ok).
        centers (B, V, 4) f32: [pillar center xyz, 0].
        pillar_bias (B, V, C) f32: per-pillar linear terms + BN shift.
        counts (B, V) int32.
        w4 (4, C): effective per-point weight (already times BN inv scale).
        shift (C,) f32: BN shift alone (padded-row pre-relu value).
    Returns (B, V, C) out_dtype.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, v, p, _ = vox4.shape
    c = w4.shape[1]
    pad = (-v) % TILE_V
    if pad:
        vox4 = jnp.pad(vox4, ((0, 0), (0, pad), (0, 0), (0, 0)))
        centers = jnp.pad(centers, ((0, 0), (0, pad), (0, 0)))
        pillar_bias = jnp.pad(pillar_bias, ((0, 0), (0, pad), (0, 0)))
        counts = jnp.pad(counts, ((0, 0), (0, pad)))
    vp = v + pad
    t = vp // TILE_V

    out = pl.pallas_call(
        _vfe_kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, TILE_V, p, 4), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, TILE_V, 4), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, TILE_V, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, TILE_V), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((4, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_V, c), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, vp, c), out_dtype),
        interpret=interpret,
    )(vox4, centers, pillar_bias, counts[:, None, :].astype(jnp.int32),
      w4.astype(jnp.bfloat16), shift.reshape(1, c).astype(jnp.float32))
    return out[:, :v]
