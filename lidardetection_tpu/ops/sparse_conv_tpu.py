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

Gradient: kernel-accelerated on both legs. dW runs
`rulebook_conv_dw_pallas` (same windowed one-hot structure contracted
over output tiles); df re-runs the forward kernel over the TRANSPOSED
rulebook (gather and scatter are adjoint, so scatter-add of cotangents
equals a gather over the inverse map — ops/sparse.py builds the paired
inverse rulebooks host-side). The custom_vjp wiring lives in
ops/sparse.py (search `custom_vjp`); XLA vjp remains the df fallback
when no transposed rulebook is available.
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


def _rb_kernel_v2(q_ref, ns_ref, rt_ref, w_ref, f_any, out_ref,
                  fwin, gbuf, tail, sem, tsem, *, blk, t_out, n_k, n_win, c):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    w = n_win * blk
    dt = fwin.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def dma(k, slot):
        base = q_ref[b, k, t] * blk
        return pltpu.make_async_copy(
            f_any.at[b, :, pl.ds(base, w)], fwin.at[slot], sem.at[slot])

    dma(0, 0).start()
    subi = jax.lax.broadcasted_iota(jnp.int32, (w, t_out), 0)
    subi1 = jax.lax.broadcasted_iota(jnp.int32, (blk, t_out), 0)

    for k in range(n_k):
        slot = k % 2
        if k + 1 < n_k:
            dma(k + 1, 1 - slot).start()
        dma(k, slot).wait()
        base = q_ref[b, k, t] * blk
        oh = (subi + base == rt_ref[0, 0, k][None, :]).astype(dt)  # (W, T)
        g = jax.lax.dot_general(
            fwin[slot], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (C, T)

        # tail blocks for wide-span tiles (row range > n_win*BLK)
        def extra(j, g):
            start = base + j * blk
            d = pltpu.make_async_copy(
                f_any.at[b, :, pl.ds(start, blk)], tail, tsem)
            d.start()
            d.wait()
            oh2 = (subi1 + start == rt_ref[0, 0, k][None, :]).astype(dt)
            return g + jax.lax.dot_general(
                tail[...], oh2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        g = jax.lax.fori_loop(n_win, ns_ref[b, k, t], extra, g)
        gbuf[k * c:(k + 1) * c, :] = g.astype(dt)

    out_ref[0] = jax.lax.dot_general(
        w_ref[...], gbuf[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (Co, T)


def rulebook_conv_pallas_v2(features, rulebook, weights, t_out=128, blk=128,
                            n_win=2, interpret=False):
    """Same contract as `rulebook_conv_pallas`, K-inside-kernel variant.

    One grid step per (batch, t_out-row output tile); the kernel loops over
    all K offsets with double-buffered window DMAs (HBM->VMEM), gathers each
    offset into a stacked (K*C, T) buffer with small one-hot dots, and
    applies all weights in ONE (K*C, Co) x (K*C, T) MXU contraction. Versus
    the k-in-grid kernel this cuts grid steps K-fold and one-hot FLOPs
    ~(W_v1/W_v2)-fold (the one-hot matmul cost is 2*B*K*V*Co*W — linear in
    the window width, so T=128/W=256 beats T=1024/W=1280 five-fold).
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
    # (B, nt, K, T): one block per (b, t) carries every offset's tile rows
    rt4 = jnp.swapaxes(rt.reshape(bsz, n_k, nt, t_out), 1, 2)
    w2 = weights.reshape(n_k * c, c_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, n_k, t_out), lambda b, t, q, ns: (b, t, 0, 0)),
            pl.BlockSpec((n_k * c, c_out), lambda b, t, q, ns: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c_out, t_out),
                               lambda b, t, q, ns: (b, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((2, c, n_win * blk), ft.dtype),
            pltpu.VMEM((n_k * c, t_out), ft.dtype),
            pltpu.VMEM((c, blk), ft.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_rb_kernel_v2, blk=blk, t_out=t_out, n_k=n_k,
                          n_win=n_win, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, nt * t_out), jnp.float32),
        interpret=interpret,
    )(q, nsub, rt4, w2, ft)
    return jnp.swapaxes(out_t, 1, 2)[:, :v_out]


def _prep_group(rulebook, v_in, t_out, blk, n_blocks, n_wg, n_groups):
    """Group-level window placement for the z-grouped kernel (v3).

    Offsets are grouped by their first (z) coordinate — contiguous runs of
    m = K/n_groups rows in the row-major offset order. Sorted tables put
    in-plane (same-z) neighbors within a few rows of the output band, so
    one window per group covers all m offsets.

    Returns:
        rt: (B, K, nt*t_out) int32, miss/padding = -1
        qg: (B, G, nt) int32 first window block per group
        eb: (B, K, nt) int32 per-offset absolute end block (exclusive)
    """
    bsz, v_out, k = rulebook.shape
    m = k // n_groups
    nt = -(-v_out // t_out)
    pad = nt * t_out - v_out
    rt = jnp.swapaxes(rulebook, 1, 2)  # (B, K, Vo)
    rt = jnp.where(rt >= v_in, -1, rt)
    if pad:
        rt = jnp.pad(rt, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    tiles = rt.reshape(bsz, k, nt, t_out)
    val = tiles >= 0
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(val, tiles, big), axis=-1)  # (B, K, nt)
    hi = jnp.max(jnp.where(val, tiles, -1), axis=-1)
    lob = jnp.clip(lo // blk, 0, n_blocks - 1)
    lo_g = jnp.min(lob.reshape(bsz, n_groups, m, nt), axis=2)
    qg = jnp.clip(lo_g, 0, n_blocks - n_wg).astype(jnp.int32)
    # group-level absolute end block (exclusive): tails past the window
    eb = jnp.clip(hi // blk + 1, 0, n_blocks)
    eb = jnp.max(eb.reshape(bsz, n_groups, m, nt), axis=2).astype(jnp.int32)
    return rt, qg, eb


def _rb_kernel_v3(qg_ref, eb_ref, rt_ref, w_ref, f_any, out_ref,
                  fwin, gsc, gbuf, tail, sem, tsem,
                  *, blk, t_out, n_k, n_wg, n_groups, c):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    m = n_k // n_groups
    w = n_wg * blk
    dt = fwin.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def dma(g, slot):
        base = qg_ref[b, g, t] * blk
        return pltpu.make_async_copy(
            f_any.at[b, :, pl.ds(base, w)], fwin.at[slot], sem.at[slot])

    dma(0, 0).start()
    subi = jax.lax.broadcasted_iota(jnp.int32, (w, t_out), 0)
    subi1 = jax.lax.broadcasted_iota(jnp.int32, (blk, t_out), 0)

    for g in range(n_groups):
        slot = g % 2
        if g + 1 < n_groups:
            dma(g + 1, 1 - slot).start()
        dma(g, slot).wait()
        base = qg_ref[b, g, t] * blk
        for j in range(m):
            k = g * m + j
            gsc[:, j * t_out:(j + 1) * t_out] = (
                subi + base == rt_ref[0, 0, k][None, :]).astype(dt)
        gall = jax.lax.dot_general(
            fwin[slot], gsc[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (C, m*T)

        # tail blocks for offsets whose matched rows overrun the group
        # window (rare: cross-z density jumps) — one combined dot per block
        def extra(jb, gall):
            start = jb * blk
            d = pltpu.make_async_copy(
                f_any.at[b, :, pl.ds(start, blk)], tail, tsem)
            d.start()
            d.wait()
            for j in range(m):
                k = g * m + j
                gsc[blk:2 * blk, j * t_out:(j + 1) * t_out] = (
                    subi1 + start == rt_ref[0, 0, k][None, :]).astype(dt)
            return gall + jax.lax.dot_general(
                tail[...], gsc[blk:2 * blk, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        gall = jax.lax.fori_loop(
            qg_ref[b, g, t] + n_wg, eb_ref[b, g, t], extra, gall)
        for j in range(m):
            k = g * m + j
            gbuf[k * c:(k + 1) * c, :] = \
                gall[:, j * t_out:(j + 1) * t_out].astype(dt)

    out_ref[0] = jax.lax.dot_general(
        w_ref[...], gbuf[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (Co, T)


def rulebook_conv_pallas_v3(features, rulebook, weights, kernel_z=3,
                            t_out=256, blk=128, n_wg=4, interpret=False):
    """Same contract as `rulebook_conv_pallas`, z-grouped variant.

    One grid step per (batch, t_out-row output tile). Offsets sharing a z
    coordinate share ONE double-buffered window DMA (sorted tables keep
    same-z neighbors within a few rows of the output band, so a window of
    t_out + slack rows covers all of them) and ONE combined one-hot MXU
    contraction (C, W) x (W, m*T). All K gathers then collapse into a
    single (K*C, Co) x (K*C, T) weight GEMM. Versus v1 this cuts one-hot
    FLOPs ~(W_v1/W_v3)x and grid steps Kx; versus v2 it replaces 27
    latency-bound window DMAs per step with `kernel_z` bandwidth-bound
    ones.

    kernel_z: size of the kernel's leading (z) dimension — offsets are
    grouped into kernel_z contiguous runs of K/kernel_z.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, v_in, c = features.shape
    _, v_out, n_k = rulebook.shape
    c_out = weights.shape[-1]
    assert n_k % kernel_z == 0, (n_k, kernel_z)
    m = n_k // kernel_z
    n_blocks = -(-v_in // blk) + n_wg - 1
    v_pad = n_blocks * blk

    ft = jnp.swapaxes(features, 1, 2)  # (B, C, V_in)
    ft = jnp.pad(ft, ((0, 0), (0, 0), (0, v_pad - v_in)))
    rt, qg, eb = _prep_group(rulebook, v_in, t_out, blk, n_blocks, n_wg,
                             kernel_z)
    nt = rt.shape[-1] // t_out
    rt4 = jnp.swapaxes(rt.reshape(bsz, n_k, nt, t_out), 1, 2)
    w2 = weights.reshape(n_k * c, c_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, n_k, t_out), lambda b, t, q, e: (b, t, 0, 0)),
            pl.BlockSpec((n_k * c, c_out), lambda b, t, q, e: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c_out, t_out),
                               lambda b, t, q, e: (b, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((2, c, n_wg * blk), ft.dtype),
            pltpu.VMEM((n_wg * blk, m * t_out), ft.dtype),
            pltpu.VMEM((n_k * c, t_out), ft.dtype),
            pltpu.VMEM((c, blk), ft.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_rb_kernel_v3, blk=blk, t_out=t_out, n_k=n_k,
                          n_wg=n_wg, n_groups=kernel_z, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, nt * t_out), jnp.float32),
        interpret=interpret,
    )(qg, eb, rt4, w2, ft)
    return jnp.swapaxes(out_t, 1, 2)[:, :v_out]


def _dw_kernel(qg_ref, eb_ref, rt_ref, g_any, f_any, out_ref,
               fwin, gsc, gtile, tail, sem, gsem, tsem,
               *, blk, t_out, n_k, n_wg, n_groups, c, c_out):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    m = n_k // n_groups
    w = n_wg * blk
    dt = fwin.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    gd = pltpu.make_async_copy(
        g_any.at[b, :, pl.ds(t * t_out, t_out)], gtile, gsem)
    gd.start()

    def dma(g, slot):
        base = qg_ref[b, g, t] * blk
        return pltpu.make_async_copy(
            f_any.at[b, :, pl.ds(base, w)], fwin.at[slot], sem.at[slot])

    dma(0, 0).start()
    subi = jax.lax.broadcasted_iota(jnp.int32, (w, t_out), 0)
    subi1 = jax.lax.broadcasted_iota(jnp.int32, (blk, t_out), 0)

    for g in range(n_groups):
        slot = g % 2
        if g + 1 < n_groups:
            dma(g + 1, 1 - slot).start()
        dma(g, slot).wait()
        base = qg_ref[b, g, t] * blk
        for j in range(m):
            k = g * m + j
            gsc[:, j * t_out:(j + 1) * t_out] = (
                subi + base == rt_ref[0, 0, k][None, :]).astype(dt)
        gall = jax.lax.dot_general(
            fwin[slot], gsc[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (C, m*T)

        def extra(jb, gall):
            start = jb * blk
            d = pltpu.make_async_copy(
                f_any.at[b, :, pl.ds(start, blk)], tail, tsem)
            d.start()
            d.wait()
            for j in range(m):
                k = g * m + j
                gsc[blk:2 * blk, j * t_out:(j + 1) * t_out] = (
                    subi1 + start == rt_ref[0, 0, k][None, :]).astype(dt)
            return gall + jax.lax.dot_general(
                tail[...], gsc[blk:2 * blk, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        gall = jax.lax.fori_loop(
            qg_ref[b, g, t] + n_wg, eb_ref[b, g, t], extra, gall)

        if g == 0:
            gd.wait()
        # dW[k] += gathered_k (C, T) . g_tile (Co, T)^T — contraction on
        # the shared T lanes; accumulate across the sequential grid
        gt = gtile[...]
        for j in range(m):
            k = g * m + j
            contrib = jax.lax.dot_general(
                gall[:, j * t_out:(j + 1) * t_out].astype(dt), gt,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)  # (C, Co)
            sl = slice(k * c, (k + 1) * c)

            @pl.when((b == 0) & (t == 0))
            def _init():
                out_ref[sl, :] = contrib

            @pl.when((b > 0) | (t > 0))
            def _acc():
                out_ref[sl, :] += contrib


def rulebook_conv_dw_pallas(features, rulebook, grad, kernel_z=3,
                            t_out=256, blk=128, n_wg=4, interpret=False):
    """dW of `rulebook_conv_pallas*`: dW[k] = sum_{b,o} f[rb[o,k]] g[o]^T.

    Reuses the v3 z-grouped windowed gather (same monotone-rulebook
    contract), contracting each offset's gathered tile against the output
    tile's gradient on the MXU and accumulating across the sequential
    grid. Misses contribute zero (their one-hot column is empty).

    features: (B, V_in, C); rulebook: (B, V_out, K); grad: (B, V_out, Co)
    (pre-masked by the caller). Returns (K, C, Co) float32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, v_in, c = features.shape
    _, v_out, n_k = rulebook.shape
    c_out = grad.shape[-1]
    if n_k % kernel_z:
        kernel_z = 1
    m = n_k // kernel_z
    n_blocks = -(-v_in // blk) + n_wg - 1
    v_pad = n_blocks * blk

    ft = jnp.swapaxes(features, 1, 2)  # (B, C, V_in)
    ft = jnp.pad(ft, ((0, 0), (0, 0), (0, v_pad - v_in)))
    rt, qg, eb = _prep_group(rulebook, v_in, t_out, blk, n_blocks, n_wg,
                             kernel_z)
    nt = rt.shape[-1] // t_out
    rt4 = jnp.swapaxes(rt.reshape(bsz, n_k, nt, t_out), 1, 2)
    gt = jnp.swapaxes(grad, 1, 2).astype(ft.dtype)  # (B, Co, V_out)
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, nt * t_out - v_out)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, n_k, t_out), lambda b, t, q, e: (b, t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((n_k * c, c_out), lambda b, t, q, e: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, n_wg * blk), ft.dtype),
            pltpu.VMEM((n_wg * blk, m * t_out), ft.dtype),
            pltpu.VMEM((c_out, t_out), ft.dtype),
            pltpu.VMEM((c, blk), ft.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_dw_kernel, blk=blk, t_out=t_out, n_k=n_k,
                          n_wg=n_wg, n_groups=kernel_z, c=c, c_out=c_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_k * c, c_out), jnp.float32),
        interpret=interpret,
    )(qg, eb, rt4, gt, ft)
    return out.reshape(n_k, c, c_out)


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
