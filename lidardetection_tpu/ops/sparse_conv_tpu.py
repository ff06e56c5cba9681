"""TPU Pallas rulebook convolution: windowed one-hot gather-GEMM.

This is the execution engine behind every sparse 3D conv (the hot op of
SECOND / PV-RCNN / Part-A2 / UNet backbones; reference: spconv's
gather-GEMM-scatter pipeline, pcdet/models/backbones_3d/spconv_backbone.py:3).

Why not XLA: a row gather on XLA:TPU serialises at ~10.6 ns/index
regardless of row width (measured: (B8, 1.08M idx) gathers cost ~92 ms
whether C=16 or C=128), so `features[rulebook]` costs ~78 ms per conv
layer at SECOND eval shapes — 100x the HBM-bound floor.

Key structural fact (established by ops/sparse.py's sorted-table
contract): every rulebook column is MONOTONE in the output row index.
Voxel tables are sorted by linear key; for a fixed kernel offset the
query keys (key + delta, or the strided/inverse affine maps) are
strictly increasing in the output row, so the matched input rows are
ascending (misses excluded). Hence the input rows feeding any T_OUT
consecutive outputs at one offset live in a narrow row window, and the
gather becomes a windowed one-hot matmul on the MXU — the mirror image
of ops/scatter_tpu.py.

Layout: everything runs transposed, features (B, C, V). Each dot is then
canonical MXU work with output lanes = window/tile rows (128-multiples):

    hw      (Co, W)  = W_k^T (C, Co)  . fwin (C, W)     [fuse weights in]
    contrib (Co, T)  = hw    (Co, W)  . onehot (W, T)
    out[:, tile]    += contrib                            [k innermost]

The window (2*BLK rows at the tile's minimum matched row) is routed by
scalar-prefetched BlockSpec index maps — Mosaic double-buffers the block
fetches. Tiles whose matched rows span more than 2*BLK (occupancy-density
jumps across z-slabs make this rare but real) take a dynamic fori_loop of
manual HBM->VMEM DMAs covering the tail blocks, so the kernel is exact
for every rulebook, with zero host fallback.

Gradient: forward pallas, backward = jax.vjp of the XLA reference
implementation (correct everywhere; sparse training on TPU is not yet
kernel-accelerated).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

T_OUT = 1024  # output rows per grid step
BLK = 256     # feats window granularity; the routed window is N_WIN*BLK rows
N_WIN = 5     # routed window blocks (swept on-chip 2026-08-18: t1024/blk256/
# nw5 beat t256/blk128/nw2 by 1.7x — fewer grid steps + fewer tail DMAs)


def _prep(rulebook, v_in, t_out, blk, n_blocks, n_win):
    """Transpose the rulebook and derive per-(k, tile) window placement.

    Returns:
        rt:   (B, K, nt*t_out) int32, miss/padding = -1
        q:    (B, K, nt) int32 first window block (<= n_blocks - 2)
        nsub: (B, K, nt) int32 total blocks spanned (>= 2, <= n_blocks - q)
    """
    bsz, v_out, k = rulebook.shape
    nt = -(-v_out // t_out)
    pad = nt * t_out - v_out
    rt = jnp.swapaxes(rulebook, 1, 2)  # (B, K, Vo)
    rt = jnp.where(rt >= v_in, -1, rt)
    if pad:
        rt = jnp.pad(rt, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    tiles = rt.reshape(bsz, k, nt, t_out)
    val = tiles >= 0
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(val, tiles, big), axis=-1)
    hi = jnp.max(jnp.where(val, tiles, -1), axis=-1)
    q = jnp.clip(lo // blk, 0, n_blocks - n_win).astype(jnp.int32)
    last = jnp.clip(hi // blk, 0, n_blocks - 1)
    nsub = jnp.clip(last - q + 1, n_win, n_blocks - q).astype(jnp.int32)
    return rt, q, nsub


def _rb_kernel(q_ref, ns_ref, rt_ref, *rest, blk, t_out, n_k, n_win):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fwin = rest[:n_win]
    w_ref, f_any, out_ref, fscr, sem = rest[n_win:]

    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)
    base = q_ref[b, k, t] * blk
    dt = fwin[0].dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    w2 = n_win * blk
    subi = jax.lax.broadcasted_iota(jnp.int32, (w2, t_out), 0)
    onehot = (subi + base == rt_ref[0]).astype(dt)  # (W, T)
    fw = jnp.concatenate([f[0] for f in fwin], axis=1)  # (C, W)
    wk = w_ref[0]  # (C, Co)
    hw = jax.lax.dot_general(
        wk, fw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).astype(dt)
    contrib = jax.lax.dot_general(
        hw, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(k == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(k > 0)
    def _acc():
        out_ref[0] += contrib

    # tail blocks for wide-span tiles (row range > n_win*BLK): manual DMA
    subi1 = jax.lax.broadcasted_iota(jnp.int32, (blk, t_out), 0)

    def extra(j, carry):
        start = base + j * blk
        dma = pltpu.make_async_copy(
            f_any.at[b, :, pl.ds(start, blk)], fscr, sem)
        dma.start()
        dma.wait()
        oh = (subi1 + start == rt_ref[0]).astype(dt)
        hw2 = jax.lax.dot_general(
            wk, fscr[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec).astype(dt)
        out_ref[0] += jax.lax.dot_general(
            hw2, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        return carry

    jax.lax.fori_loop(n_win, ns_ref[b, k, t], extra, 0)


def rulebook_conv_pallas(features, rulebook, weights, t_out=T_OUT, blk=BLK,
                         n_win=N_WIN, interpret=False):
    """out[b, o] = sum_k W[k]^T . features[b, rulebook[b, o, k]].

    features: (B, V_in, C); rulebook: (B, V_out, K) int32 rows into V_in
    (>= V_in = miss -> zero contribution), every column ascending among
    hits (the sorted-table contract); weights: (K, C, C_out).
    Returns (B, V_out, C_out) in float32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, v_in, c = features.shape
    _, v_out, n_k = rulebook.shape
    c_out = weights.shape[-1]
    n_blocks = -(-v_in // blk) + n_win - 1
    v_pad = n_blocks * blk

    ft = jnp.swapaxes(features, 1, 2)  # (B, C, V_in)
    ft = jnp.pad(ft, ((0, 0), (0, 0), (0, v_pad - v_in)))
    rt, q, nsub = _prep(rulebook, v_in, t_out, blk, n_blocks, n_win)
    nt = rt.shape[-1] // t_out

    # rt viewed (B*K, 1, V) so the rule block's trailing dims are (1, T)
    rt = rt.reshape(bsz * n_k, 1, nt * t_out)

    def win_spec(off):
        return pl.BlockSpec((1, c, blk),
                            lambda b, t, k, q, ns: (b, 0, q[b, k, t] + off))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nt, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, t_out),
                         lambda b, t, k, q, ns: (b * n_k + k, 0, t)),
            *[win_spec(off) for off in range(n_win)],
            pl.BlockSpec((1, c, c_out), lambda b, t, k, q, ns: (k, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c_out, t_out),
                               lambda b, t, k, q, ns: (b, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((c, blk), ft.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_rb_kernel, blk=blk, t_out=t_out, n_k=n_k,
                          n_win=n_win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, nt * t_out), jnp.float32),
        interpret=interpret,
    )(q, nsub, rt, *([ft] * n_win), weights, ft)
    return jnp.swapaxes(out_t, 1, 2)[:, :v_out]
