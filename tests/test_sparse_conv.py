"""Sparse conv engine vs dense convolution golden tests."""

import jax
import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.ops import sparse


def make_sparse(rng, B=2, V=64, shape=(8, 12, 10), C=5, fill=40):
    coords = np.full((B, V, 3), -1, np.int32)
    feats = np.zeros((B, V, C), np.float32)
    nums = []
    for b in range(B):
        # unique random coords
        lin = rng.choice(shape[0] * shape[1] * shape[2], size=fill, replace=False)
        z = lin // (shape[1] * shape[2])
        y = (lin % (shape[1] * shape[2])) // shape[2]
        x = lin % shape[2]
        coords[b, :fill] = np.stack([z, y, x], axis=1)
        feats[b, :fill] = rng.randn(fill, C)
        nums.append(fill)
    st = sparse.from_unsorted(jnp.asarray(feats), jnp.asarray(coords),
                              jnp.asarray(nums, jnp.int32), shape)
    return st


def dense_conv(dense_in, weights, stride=(1, 1, 1), padding=(1, 1, 1)):
    """lax 3D conv, NDHWC, weights (K, Cin, Cout) with K row-major zyx."""
    kz = ky = kx = round(weights.shape[0] ** (1 / 3))
    k3 = weights.reshape(kz, ky, kx, weights.shape[1], weights.shape[2])
    return jax.lax.conv_general_dilated(
        dense_in, k3, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1]),
                 (padding[2], padding[2])],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    st = make_sparse(rng)
    K, Cin, Cout = 27, 5, 7
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32) * 0.1)

    rule = sparse.build_subm_rulebook(st, (3, 3, 3))
    out = sparse.sparse_conv_apply(st.features, st.valid_mask, rule, w)

    dense_in = sparse.sparse_to_dense(st)
    ref = dense_conv(dense_in, w)
    for b in range(2):
        for v in range(64):
            c = np.asarray(st.coords[b, v])
            if c[0] < 0:
                np.testing.assert_allclose(np.asarray(out[b, v]), 0, atol=1e-5)
                continue
            np.testing.assert_allclose(
                np.asarray(out[b, v]), np.asarray(ref[b, c[0], c[1], c[2]]),
                rtol=1e-4, atol=1e-4)


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    st = make_sparse(rng)
    K, Cin, Cout = 27, 5, 6
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32) * 0.1)

    out_coords, out_num, out_shape = sparse.build_strided_out_coords(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=128)
    rule = sparse.build_strided_rulebook(
        st, out_coords, out_shape, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    out = sparse.sparse_conv_apply(
        st.features, out_coords[..., 0] >= 0, rule, w)

    dense_in = sparse.sparse_to_dense(st)
    ref = dense_conv(dense_in, w, stride=(2, 2, 2))
    assert ref.shape[1:4] == out_shape
    for b in range(2):
        n = int(out_num[b])
        assert n > 0
        for v in range(n):
            c = np.asarray(out_coords[b, v])
            np.testing.assert_allclose(
                np.asarray(out[b, v]), np.asarray(ref[b, c[0], c[1], c[2]]),
                rtol=1e-4, atol=1e-4)
        # every dense output with nonzero value within receptive fields of
        # active inputs must be in the active set (no missed outputs)
        ref_b = np.asarray(ref[b])
        nz = np.argwhere(np.abs(ref_b).sum(-1) > 1e-5)
        active = {tuple(np.asarray(out_coords[b, v])) for v in range(n)}
        for c in nz:
            assert tuple(c) in active


def test_z_compression_conv():
    """The (3,1,1)/(2,1,1) z-compression conv (spconv_backbone.py:110-117)."""
    rng = np.random.RandomState(2)
    st = make_sparse(rng)
    K, Cin, Cout = 3, 5, 4
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32) * 0.1)
    out_coords, out_num, out_shape = sparse.build_strided_out_coords(
        st, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_capacity=128)
    rule = sparse.build_strided_rulebook(
        st, out_coords, out_shape, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    out = sparse.sparse_conv_apply(st.features, out_coords[..., 0] >= 0, rule, w)
    dense_in = sparse.sparse_to_dense(st)
    k3 = w.reshape(3, 1, 1, Cin, Cout)
    ref = jax.lax.conv_general_dilated(
        dense_in, k3, window_strides=(2, 1, 1), padding=[(0, 0), (0, 0), (0, 0)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    assert ref.shape[1:4] == out_shape
    for b in range(2):
        for v in range(int(out_num[b])):
            c = np.asarray(out_coords[b, v])
            np.testing.assert_allclose(
                np.asarray(out[b, v]), np.asarray(ref[b, c[0], c[1], c[2]]),
                rtol=1e-4, atol=1e-4)


def test_inverse_conv_restores_coords_and_matches_dense():
    rng = np.random.RandomState(3)
    st = make_sparse(rng)
    # downsample first
    out_coords, out_num, out_shape = sparse.build_strided_out_coords(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=128)
    rule = sparse.build_strided_rulebook(
        st, out_coords, out_shape, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    Cin, Cmid, Cout = 5, 6, 4
    w_down = jnp.asarray(rng.randn(27, Cin, Cmid).astype(np.float32) * 0.1)
    down_feats = sparse.sparse_conv_apply(
        st.features, out_coords[..., 0] >= 0, rule, w_down)
    down = sparse.SparseTensor(down_feats, out_coords, out_num, out_shape)

    # inverse conv back to the original coords
    w_up = jnp.asarray(rng.randn(27, Cmid, Cout).astype(np.float32) * 0.1)
    inv_rule = sparse.build_inverse_rulebook(
        down, st.coords, st.spatial_shape, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    up = sparse.sparse_conv_apply(down.features, st.valid_mask, inv_rule, w_up)
    assert up.shape == (2, 64, Cout)

    # dense reference: transposed conv relation — up[u] = sum_k W[k] @
    # down[o] where o*s - p + k == u
    dense_down = sparse.sparse_to_dense(down)
    for b in range(2):
        for v in range(int(st.num_voxels[b])):
            u = np.asarray(st.coords[b, v])
            if u[0] < 0:
                continue
            acc = np.zeros(Cout, np.float32)
            for k in range(27):
                kz, ky, kx = k // 9, (k % 9) // 3, k % 3
                num = u + np.array([1, 1, 1]) - np.array([kz, ky, kx])
                if np.any(num % 2):
                    continue
                o = num // 2
                if np.any(o < 0) or np.any(o >= np.asarray(out_shape)):
                    continue
                acc += np.asarray(dense_down[b, o[0], o[1], o[2]]) @ np.asarray(w_up[k])
            np.testing.assert_allclose(np.asarray(up[b, v]), acc, rtol=1e-3, atol=1e-4)


def _random_monotone_rulebook(rng, B, Vi, Vo, K, wide_col=None):
    """Monotone-per-column rulebook with misses (= Vi), like the builders."""
    rule = np.full((B, Vo, K), Vi, np.int32)
    for b in range(B):
        for k in range(K):
            hits = rng.rand(Vo) < 0.6
            vals = np.sort(rng.choice(Vi, size=hits.sum(), replace=False))
            rule[b, hits, k] = vals
    if wide_col is not None:
        # span the whole input table inside single output tiles: exercises
        # the kernel's dynamic tail-DMA path
        rule[0, :, wide_col] = np.linspace(0, Vi - 1, Vo).astype(np.int32)
    return rule


def test_rulebook_conv_pallas_matches_xla():
    from lidardetection_tpu.ops.sparse_conv_tpu import rulebook_conv_pallas

    rng = np.random.RandomState(3)
    B, Vi, Vo, K, C, Co = 2, 600, 500, 27, 16, 32
    rule = _random_monotone_rulebook(rng, B, Vi, Vo, K, wide_col=5)
    f = rng.randn(B, Vi, C).astype(np.float32)
    w = (rng.randn(K, C, Co) * 0.1).astype(np.float32)
    vm = np.ones((B, Vo), bool)
    vm[:, -7:] = False

    ref = np.asarray(sparse._conv_apply_xla(
        jnp.asarray(f), jnp.asarray(vm), jnp.asarray(rule), jnp.asarray(w)))
    for t_out, blk, n_win in ((128, 64, 2), (128, 64, 3), (256, 128, 5)):
        out = np.asarray(rulebook_conv_pallas(
            jnp.asarray(f), jnp.asarray(rule), jnp.asarray(w),
            t_out=t_out, blk=blk, n_win=n_win, interpret=True))
        out = out * vm[..., None]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_rulebook_conv_pallas_v2_matches_xla():
    from lidardetection_tpu.ops.sparse_conv_tpu import rulebook_conv_pallas_v2

    rng = np.random.RandomState(7)
    B, Vi, Vo, K, C, Co = 2, 600, 500, 27, 16, 32
    rule = _random_monotone_rulebook(rng, B, Vi, Vo, K, wide_col=5)
    f = rng.randn(B, Vi, C).astype(np.float32)
    w = (rng.randn(K, C, Co) * 0.1).astype(np.float32)
    vm = np.ones((B, Vo), bool)
    vm[:, -7:] = False

    ref = np.asarray(sparse._conv_apply_xla(
        jnp.asarray(f), jnp.asarray(vm), jnp.asarray(rule), jnp.asarray(w)))
    for t_out, blk, n_win in ((128, 64, 2), (128, 128, 2), (256, 128, 3)):
        out = np.asarray(rulebook_conv_pallas_v2(
            jnp.asarray(f), jnp.asarray(rule), jnp.asarray(w),
            t_out=t_out, blk=blk, n_win=n_win, interpret=True))
        out = out * vm[..., None]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_rulebook_conv_pallas_v3_matches_xla():
    from lidardetection_tpu.ops.sparse_conv_tpu import rulebook_conv_pallas_v3

    rng = np.random.RandomState(11)
    B, Vi, Vo, K, C, Co = 2, 600, 500, 27, 16, 32
    rule = _random_monotone_rulebook(rng, B, Vi, Vo, K, wide_col=5)
    f = rng.randn(B, Vi, C).astype(np.float32)
    w = (rng.randn(K, C, Co) * 0.1).astype(np.float32)
    vm = np.ones((B, Vo), bool)
    vm[:, -7:] = False

    ref = np.asarray(sparse._conv_apply_xla(
        jnp.asarray(f), jnp.asarray(vm), jnp.asarray(rule), jnp.asarray(w)))
    for t_out, blk, n_wg in ((128, 64, 3), (128, 128, 2), (256, 128, 4)):
        out = np.asarray(rulebook_conv_pallas_v3(
            jnp.asarray(f), jnp.asarray(rule), jnp.asarray(w), kernel_z=3,
            t_out=t_out, blk=blk, n_wg=n_wg, interpret=True))
        out = out * vm[..., None]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    # z-compression kernel shape (K=3, one offset per group)
    rule3 = _random_monotone_rulebook(rng, B, Vi, Vo, 3)
    w3 = (rng.randn(3, C, Co) * 0.1).astype(np.float32)
    ref3 = np.asarray(sparse._conv_apply_xla(
        jnp.asarray(f), jnp.asarray(vm), jnp.asarray(rule3), jnp.asarray(w3)))
    out3 = np.asarray(rulebook_conv_pallas_v3(
        jnp.asarray(f), jnp.asarray(rule3), jnp.asarray(w3), kernel_z=3,
        t_out=128, blk=64, n_wg=3, interpret=True)) * vm[..., None]
    np.testing.assert_allclose(out3, ref3, rtol=1e-5, atol=1e-4)


def test_rulebook_columns_are_monotone():
    """The kernel's window contract: every builder's columns ascend (among
    hits) in the sorted-table output order."""
    rng = np.random.RandomState(4)
    st = make_sparse(rng, B=2, V=80, shape=(6, 14, 12), C=4, fill=60)

    def assert_monotone(rule, v_in):
        r = np.asarray(rule).astype(np.int64)
        r[r >= v_in] = -1
        for b in range(r.shape[0]):
            for k in range(r.shape[2]):
                col = r[b, :, k]
                hits = col[col >= 0]
                assert (np.diff(hits) > 0).all(), (b, k)

    v_in = st.coords.shape[1]
    assert_monotone(sparse.build_subm_rulebook(st), v_in)

    oc, on, oshape = sparse.build_strided_out_coords(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
    assert_monotone(sparse.build_strided_rulebook(
        st, oc, oshape, (3, 3, 3), (2, 2, 2), (1, 1, 1)), v_in)

    down = sparse.SparseTensor(
        jnp.zeros((2, 64, 4)), oc, on, oshape)
    assert_monotone(sparse.build_inverse_rulebook(
        down, st.coords, st.spatial_shape, (3, 3, 3), (2, 2, 2), (1, 1, 1)),
        64)
