"""Sparse 3D convolution engine (rulebook gather-GEMM-scatter).

TPU-native replacement for the external spconv dependency the reference
builds its 3D backbones on (pcdet/models/backbones_3d/spconv_backbone.py:3:
SubMConv3d / SparseConv3d / SparseInverseConv3d over SparseConvTensor, with
rulebooks cached per indice_key, :84-106).

Design (everything static-shape, jit-safe, vmapped over batch):
  * active voxels live in a fixed-capacity table: coords (V, 3) int32
    (z, y, x), -1-padded, plus a valid count;
  * voxel coords are sorted by linear key once per tensor; neighbor lookup
    is a vectorized binary search (jnp.searchsorted) instead of spconv's
    GPU hash table — O(K·V·log V) fully-parallel gathers;
  * a rulebook is a dense (V_out, K) table of input row indices (V_in =
    miss -> routed to an all-zero spill row);
  * the convolution itself is one MXU matmul: gather (V_out, K, C_in),
    reshape to (V_out, K*C_in), multiply by the (K*C_in, C_out) kernel —
    the gather-GEMM-scatter of spconv with the scatter made trivial by
    producing outputs already in table order;
  * strided output coordinates are derived by enumerating the
    ceil(K/stride) candidate parents per input voxel, then sort+unique to a
    fixed capacity (same construction as ops.voxelize.voxelize_jax);
  * inverse convolution reuses the coords of the paired downsample layer
    (the indice_key mechanism) with the rulebook roles swapped.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseTensor(NamedTuple):
    """Batched fixed-capacity sparse voxel tensor.

    features: (B, V, C) float; coords: (B, V, 3) int32 (z, y, x), -1 pad;
    num_voxels: (B,) int32; spatial_shape: static (D, H, W).

    Invariant: rows are sorted by linear key (z, y, x) with padding rows
    (key = D*H*W) at the tail — established by `from_unsorted`.
    """

    features: jnp.ndarray
    coords: jnp.ndarray
    num_voxels: jnp.ndarray
    spatial_shape: tuple

    @property
    def valid_mask(self):
        return self.coords[..., 0] >= 0


def linear_key(coords, spatial_shape):
    """(..., 3) zyx -> linear key; invalid (-1) rows get the sentinel D*H*W."""
    d, h, w = spatial_shape
    key = (coords[..., 0] * h + coords[..., 1]) * w + coords[..., 2]
    return jnp.where(coords[..., 0] < 0, d * h * w, key)


def from_unsorted(features, coords, num_voxels, spatial_shape):
    """Sort rows by linear key -> canonical SparseTensor."""
    def one(f, c):
        key = linear_key(c, spatial_shape)
        order = jnp.argsort(key)
        return f[order], c[order]

    f, c = jax.vmap(one)(features, coords)
    return SparseTensor(f, c, num_voxels, spatial_shape)


def _lookup_rows(sorted_keys, query_keys, sentinel):
    """Row index of each query key in sorted_keys, or `miss_row` = len(keys).

    sorted_keys: (V,) ascending with sentinel-padded tail; query (Q,).

    method='sort' turns the lookup into ONE argsort of (V + Q) keys —
    pure bitonic vector passes — instead of binary search, whose log2(V)
    sequential rounds each gather Q table elements (measured 117 ms per
    (16k-table, 432k-query) lookup on v5e vs ~1 ms for the sort).
    """
    v = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, query_keys, method='sort')
    pos = jnp.clip(pos, 0, v - 1)
    hit = (sorted_keys[pos] == query_keys) & (query_keys < sentinel)
    return jnp.where(hit, pos, v).astype(jnp.int32)


def _kernel_offsets(kernel_size):
    """(K, 3) zyx offsets, row-major (matches spconv weight layout order)."""
    kz, ky, kx = kernel_size
    oz, oy, ox = np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx),
                             indexing='ij')
    return np.stack([oz, oy, ox], axis=-1).reshape(-1, 3)


def build_subm_rulebook(st: SparseTensor, kernel_size=(3, 3, 3)):
    """Submanifold rulebook: outputs = inputs; neighbor per kernel offset.

    Returns (B, V, K) int32 rows into the input table (V = miss).
    SubMConv3d semantics: same coords in/out, kernel centered (odd sizes).
    """
    offsets = _kernel_offsets(kernel_size)
    center = (np.asarray(kernel_size) - 1) // 2
    rel = jnp.asarray(offsets - center, jnp.int32)  # (K, 3)
    d, h, w = st.spatial_shape
    sentinel = d * h * w

    def one(coords):
        keys = linear_key(coords, st.spatial_shape)  # sorted
        nbr = coords[:, None, :] + rel[None, :, :]  # (V, K, 3)
        in_range = jnp.all((nbr >= 0) & (nbr < jnp.asarray([d, h, w])), axis=-1)
        nbr_keys = linear_key(nbr, st.spatial_shape)
        nbr_keys = jnp.where(in_range & (coords[:, 0:1] >= 0), nbr_keys, sentinel)
        return _lookup_rows(keys, nbr_keys.reshape(-1), sentinel).reshape(nbr_keys.shape)

    return jax.vmap(one)(st.coords)


def _conv_apply_xla(features, valid_mask, rulebook, weights):
    """XLA gather-GEMM reference: out[o] = sum_k W[k] @ in[rule[o, k]].

    Fine on CPU; on TPU the row gather serialises (~10.6 ns/index, ~78 ms
    per layer at SECOND eval shapes) — the Pallas kernel below replaces it.
    """
    k, cin, cout = weights.shape

    def one(f, rule, valid):
        f_ext = jnp.concatenate([f, jnp.zeros((1, f.shape[1]), f.dtype)], axis=0)
        gathered = f_ext[rule]  # (V_out, K, C_in)
        out = jax.lax.dot_general(
            gathered.reshape(gathered.shape[0], k * cin),
            weights.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out * valid[:, None]

    return jax.vmap(one)(features, rulebook, valid_mask)


def sparse_conv_apply(features, valid_mask, rulebook, weights,
                      rb_bwd=None, in_valid=None, subm=False):
    """Gather-GEMM: out[o] = sum_k W[k] @ in[rule[o, k]].

    Args:
        features: (B, V_in, C_in); valid_mask: (B, V_out) output validity;
        rulebook: (B, V_out, K) rows into V_in (V_in = miss), every column
            ascending among hits (all build_*_rulebook outputs qualify);
        weights: (K, C_in, C_out).
        rb_bwd: optional (B, V_in, K) transposed rulebook for the input
            gradient (rb_bwd[i, k] = the output row whose offset-k input
            is i, or V_out for none) — the plan's 'inv' rulebook of a down
            op, or the paired down rulebook for an inverse conv.
        in_valid: (B, V_in) input-table validity (required with rb_bwd).
        subm: submanifold conv on a shared table — the transposed rulebook
            is the FORWARD rulebook with the kernel offsets reversed
            (offset delta_k maps o->i iff -delta_k maps i->o), so no extra
            rulebook is needed.
    Returns: (B, V_out, C_out) float32.

    On TPU the forward runs the Pallas windowed one-hot kernel
    (ops/sparse_conv_tpu.py). Backward: dW always runs the Pallas dW
    kernel (transposed contraction over the SAME monotone rulebook);
    df runs the forward kernel over the transposed rulebook whenever one
    is derivable (subm flip / rb_bwd), else falls back to the XLA vjp.
    """
    if jax.devices()[0].platform != 'tpu':
        return _conv_apply_xla(features, valid_mask, rulebook, weights)

    import os

    from . import sparse_conv_tpu

    variant = os.environ.get('LDTPU_SPARSE_KERNEL', 'v3')
    if variant == 'v2':
        kernel = sparse_conv_tpu.rulebook_conv_pallas_v2
    elif variant == 'v3':
        n_k = rulebook.shape[-1]
        kz = 3 if n_k % 3 == 0 else 1
        # window blocks: the one-hot build cost is ~ W * K * V, so the
        # narrower 3-block window wins wherever its tail-DMA rate stays
        # low (swept on-chip 2026-08-20, tools/microbench_rbconv.py:
        # C16/V41k 3.96 vs 4.57, C32/V33k 3.55 vs 4.10, C64/V16k 2.39 vs
        # 2.60; only C64/V25k prefers 4: 3.83 vs 4.30)
        n_wg = 4 if (features.shape[-1] >= 64
                     and features.shape[1] >= 20000) else 3
        kernel = functools.partial(
            sparse_conv_tpu.rulebook_conv_pallas_v3, kernel_z=kz, n_wg=n_wg)
    else:
        kernel = sparse_conv_tpu.rulebook_conv_pallas

    @jax.custom_vjp
    def apply(f, w):
        out = kernel(f, rulebook, w)
        return out * valid_mask[..., None]

    def fwd(f, w):
        return apply(f, w), (f, w)

    def bwd(res, g):
        f, w = res
        gm = g * valid_mask[..., None]
        n_k = rulebook.shape[-1]
        kz = 3 if n_k % 3 == 0 else 1
        dw = sparse_conv_tpu.rulebook_conv_dw_pallas(
            f, rulebook, gm, kernel_z=kz).astype(w.dtype)
        rb_b = rulebook if subm else rb_bwd
        if rb_b is not None:
            # subm: the shared-table involution rb[i, k] = o <=>
            # rb[o, K-1-k] = i means df gathers through the FORWARD
            # rulebook with flipped+transposed weights. Plan-built
            # transposed rulebooks (down/inv) preserve the offset index,
            # so only the weight transpose applies.
            wb = jnp.flip(w, axis=0) if subm else w
            wb = jnp.swapaxes(wb, 1, 2)
            iv = valid_mask if subm else in_valid
            df = kernel(gm.astype(f.dtype), rb_b, wb)
            df = (df * iv[..., None]).astype(f.dtype)
        else:  # no transposed rulebook available: XLA vjp for df only
            _, vjp = jax.vjp(
                lambda f2: _conv_apply_xla(f2, valid_mask, rulebook, w), f)
            df = vjp(g)[0]
        return df, dw

    apply.defvjp(fwd, bwd)
    return apply(features, weights)


def build_strided_out_coords(st: SparseTensor, kernel_size, stride, padding,
                             out_capacity):
    """Active output set of a strided SparseConv3d, fixed capacity.

    Output o (per dim) receives input i iff o*s - p + k == i for some
    k in [0, K) -> candidate parents per input: o = (i + p - k)/s for the
    k making it divisible. Enumerate ceil(K/s) candidates per dim, then
    sort+unique (capacity-capped) -> canonical sorted output table.

    Returns: out_coords (B, Vc, 3), out_num (B,), with
    Vc = out_capacity; plus static out_spatial_shape.
    """
    ks = np.asarray(kernel_size)
    s = np.asarray(stride)
    p = np.asarray(padding)
    d, h, w = st.spatial_shape
    out_shape = tuple((np.asarray([d, h, w]) + 2 * p - (ks - 1) - 1) // s + 1)

    # per-dim candidate output coords: o = floor((i + p - k)/s) over the
    # k with exact divisibility; enumerate j in [0, ceil(K/s))
    n_cand = [int(np.ceil(ks[i] / s[i])) for i in range(3)]

    def one(coords):
        valid = coords[:, 0] >= 0
        cands = []
        for dim in range(3):
            i = coords[:, dim]
            os_ = []
            for j in range(n_cand[dim]):
                # smallest k >= 0 with (i + p - k) % s == 0 is (i + p) % s;
                # successive candidates step k by s
                k0 = (i + p[dim]) % s[dim]
                kk = k0 + j * s[dim]
                o = (i + p[dim] - kk) // s[dim]
                ok = (kk < ks[dim]) & (o >= 0) & (o < out_shape[dim])
                os_.append(jnp.where(ok, o, -1))
            cands.append(jnp.stack(os_, axis=1))  # (V, n_cand)
        # cartesian product over dims -> (V, n0*n1*n2, 3)
        cz = cands[0][:, :, None, None]
        cy = cands[1][:, None, :, None]
        cx = cands[2][:, None, None, :]
        shp = (coords.shape[0], n_cand[0], n_cand[1], n_cand[2])
        grid = jnp.stack([
            jnp.broadcast_to(cz, shp), jnp.broadcast_to(cy, shp),
            jnp.broadcast_to(cx, shp)
        ], axis=-1).reshape(coords.shape[0], -1, 3)
        good = jnp.all(grid >= 0, axis=-1) & valid[:, None]
        od, oh, ow = out_shape
        keys = (grid[..., 0] * oh + grid[..., 1]) * ow + grid[..., 2]
        sentinel = od * oh * ow
        keys = jnp.where(good, keys, sentinel).reshape(-1)

        skeys = jnp.sort(keys)
        is_new = (skeys < sentinel) & jnp.concatenate(
            [jnp.array([True]), skeys[1:] != skeys[:-1]])
        n_unique = jnp.sum(is_new)
        # j-th unique key sits at the first position where
        # cumsum(is_new) == j+1 — a sorted-search gather instead of a
        # scatter (XLA:TPU scatters serialize per element; this one cost
        # ~900 ms per conv layer at KITTI capacities)
        cum = jnp.cumsum(is_new.astype(jnp.int32))
        pos = jnp.searchsorted(
            cum, jnp.arange(1, out_capacity + 1, dtype=jnp.int32))
        pos = jnp.clip(pos, 0, skeys.shape[0] - 1)
        out_keys = jnp.where(jnp.arange(out_capacity) < n_unique,
                             skeys[pos].astype(jnp.int32), sentinel)
        oz = out_keys // (oh * ow)
        oyx = out_keys % (oh * ow)
        out_coords = jnp.stack([oz, oyx // ow, oyx % ow], axis=-1)
        out_coords = jnp.where(out_keys[:, None] < sentinel, out_coords, -1)
        return out_coords.astype(jnp.int32), jnp.minimum(n_unique, out_capacity).astype(jnp.int32)

    out_coords, out_num = jax.vmap(one)(st.coords)
    return out_coords, out_num, out_shape


def build_strided_rulebook(st: SparseTensor, out_coords, out_spatial_shape,
                           kernel_size, stride, padding):
    """Rulebook for a strided conv: input row feeding (output o, offset k).

    in = o*s - p + k per dim; look the key up in the sorted input table.
    Returns (B, V_out, K) int32.
    """
    offsets = jnp.asarray(_kernel_offsets(kernel_size), jnp.int32)  # (K, 3)
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    d, h, w = st.spatial_shape
    sentinel = d * h * w

    def one(in_coords, o_coords):
        keys = linear_key(in_coords, st.spatial_shape)
        in_pos = o_coords[:, None, :] * s[None, None, :] - p + offsets[None, :, :]
        ok = jnp.all((in_pos >= 0) & (in_pos < jnp.asarray([d, h, w])), axis=-1)
        ok = ok & (o_coords[:, 0:1] >= 0)
        q = linear_key(in_pos, st.spatial_shape)
        q = jnp.where(ok, q, sentinel)
        return _lookup_rows(keys, q.reshape(-1), sentinel).reshape(q.shape)

    return jax.vmap(one)(st.coords, out_coords)


def build_inverse_rulebook(down: SparseTensor, up_coords, up_spatial_shape,
                           kernel_size, stride, padding):
    """Rulebook for SparseInverseConv3d: restore the pre-downsample coords.

    Output set = `up_coords` (saved from before the paired strided conv);
    contribution: up voxel u receives down voxel o for kernel offset k iff
    o*s - p + k == u (the forward relation with roles swapped). Kernel
    offsets index the same (K,) weight layout as the forward conv.
    Returns (B, V_up, K) rows into the `down` table.
    """
    offsets = jnp.asarray(_kernel_offsets(kernel_size), jnp.int32)
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    dd, dh, dw = down.spatial_shape
    sentinel = dd * dh * dw

    def one(down_coords, u_coords):
        keys = linear_key(down_coords, down.spatial_shape)
        # o = (u + p - k) / s where divisible
        num = u_coords[:, None, :] + p - offsets[None, :, :]
        div_ok = jnp.all(num % s == 0, axis=-1)
        o = num // s
        ok = div_ok & jnp.all(
            (o >= 0) & (o < jnp.asarray([dd, dh, dw])), axis=-1)
        ok = ok & (u_coords[:, 0:1] >= 0)
        q = linear_key(o, down.spatial_shape)
        q = jnp.where(ok, q, sentinel)
        return _lookup_rows(keys, q.reshape(-1), sentinel).reshape(q.shape)

    return jax.vmap(one)(down.coords, up_coords)


def sparse_to_dense(st: SparseTensor):
    """SparseConvTensor.dense(): (B, D, H, W, C) NDHWC (vs torch NCDHW).

    SparseTensor rows are key-sorted with padding at the tail, so this is
    the tiled one-hot-matmul scatter from ops/scatter_tpu.py (Pallas on
    TPU, inverse-map gather elsewhere)."""
    from .scatter_tpu import scatter_rows_sorted

    d, h, w = st.spatial_shape
    b = st.features.shape[0]
    c = st.features.shape[-1]
    keys = linear_key(st.coords, st.spatial_shape).astype(jnp.int32)
    canvas = scatter_rows_sorted(st.features, keys, d * h * w)
    return canvas.reshape(b, d, h, w, c)
