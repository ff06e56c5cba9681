"""Golden tests for pointnet2 + RoI pooling ops vs numpy brute force."""

import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.ops import pointnet2, roi_pool


def test_fps_spreads_points():
    # two tight clusters far apart: FPS must alternate between them
    rng = np.random.RandomState(0)
    a = rng.randn(50, 3) * 0.1
    b = rng.randn(50, 3) * 0.1 + [100, 0, 0]
    pts = np.concatenate([a, b]).astype(np.float32)[None]
    idx = np.asarray(pointnet2.farthest_point_sample(
        jnp.asarray(pts), jnp.array([100]), 4))[0]
    assert idx[0] == 0
    sides = idx >= 50
    assert sides[1] != sides[0]  # second sample is in the far cluster
    assert len(set(idx.tolist())) == 4


def test_fps_ignores_padding():
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, :5] = np.random.RandomState(1).randn(5, 3)
    pts[0, 5:] = 1e6  # padding garbage far away — must never be picked
    idx = np.asarray(pointnet2.farthest_point_sample(
        jnp.asarray(pts), jnp.array([5]), 5))[0]
    assert np.all(idx < 5)


def test_sector_fps_coverage_and_validity():
    """sector_fps (TPU FPS path) must pick only valid points and cover the
    scene comparably to exact FPS (coverage radius within 2x)."""
    rng = np.random.RandomState(3)
    n, npoint, sectors = 512, 64, 8
    pts = np.zeros((2, n, 3), np.float32)
    nv = np.array([n, 300], np.int32)
    for b, m in enumerate(nv):
        r = rng.rand(m) * 50
        th = rng.rand(m) * 2 * np.pi
        pts[b, :m] = np.stack(
            [r * np.cos(th), r * np.sin(th), rng.randn(m)], axis=1)
        pts[b, m:] = 1e6  # padding garbage

    idx_s = np.asarray(pointnet2.sector_fps(
        jnp.asarray(pts), jnp.asarray(nv), npoint, sectors))
    idx_e = np.asarray(pointnet2.farthest_point_sample(
        jnp.asarray(pts), jnp.asarray(nv), npoint))

    for b, m in enumerate(nv):
        assert np.all(idx_s[b] < m)
        # coverage: max over valid points of distance to nearest sample
        d = np.linalg.norm(
            pts[b, :m, None, :] - pts[b, idx_s[b]][None, :, :], axis=-1)
        cov_s = d.min(axis=1).max()
        d = np.linalg.norm(
            pts[b, :m, None, :] - pts[b, idx_e[b]][None, :, :], axis=-1)
        cov_e = d.min(axis=1).max()
        assert cov_s <= 2.0 * cov_e + 1e-3, (cov_s, cov_e)
        # near-duplicate-free when enough valid points exist
        assert len(set(idx_s[b].tolist())) >= npoint * 0.9


def test_sector_fps_all_padding_chunks():
    # only 4 valid points, 8 sectors: empty chunks fall back to a valid idx
    pts = np.full((1, 64, 3), 1e6, np.float32)
    pts[0, :4] = np.random.RandomState(0).randn(4, 3)
    idx = np.asarray(pointnet2.sector_fps(
        jnp.asarray(pts), jnp.array([4]), 16, 8))[0]
    assert np.all(idx < 4)


def test_ball_query_semantics():
    src = np.array([[[0, 0, 0], [0.1, 0, 0], [5, 0, 0], [0.2, 0, 0],
                     [9, 9, 9]]], np.float32)
    centers = np.array([[[0, 0, 0], [5, 0, 0], [50, 50, 50]]], np.float32)
    idx, empty = pointnet2.ball_query(
        0.5, 3, jnp.asarray(src), jnp.array([4]),  # last src point = padding
        jnp.asarray(centers))
    idx = np.asarray(idx)[0]
    empty = np.asarray(empty)[0]
    np.testing.assert_array_equal(idx[0], [0, 1, 3])  # first 3 in radius
    np.testing.assert_array_equal(idx[1], [2, 2, 2])  # 1 hit, repeated
    assert not empty[0] and not empty[1] and empty[2]
    np.testing.assert_array_equal(idx[2], [0, 0, 0])  # empty -> zeros


def test_ball_query_caps_at_nsample():
    rng = np.random.RandomState(2)
    src = (rng.rand(1, 100, 3) * 0.1).astype(np.float32)
    centers = np.zeros((1, 1, 3), np.float32)
    idx, empty = pointnet2.ball_query(1.0, 16, jnp.asarray(src),
                                      jnp.array([100]), jnp.asarray(centers))
    idx = np.asarray(idx)[0, 0]
    np.testing.assert_array_equal(idx, np.arange(16))  # first 16 by index


def test_grid_ball_query_matches_brute_force():
    """Grid-bucketed (single and shared-grid multi-radius) vs ball_query:
    exact whenever cells hold <= cell_cap sources."""
    rng = np.random.RandomState(5)
    bounds = (0.0, -4.0, -2.0, 8.0, 4.0, 2.0)
    src = np.stack([rng.uniform(0, 8, 500), rng.uniform(-4, 4, 500),
                    rng.uniform(-2, 2, 500)], axis=1).astype(np.float32)
    src = src[None]
    centers = src[:, ::7] + 0.05
    n = jnp.array([460])  # tail = padding
    cvalid = jnp.ones((1, centers.shape[1]), bool)

    for radius, ns in ((0.4, 8), (0.9, 16)):
        ref_idx, ref_empty = pointnet2.ball_query(
            radius, ns, jnp.asarray(src), n, jnp.asarray(centers), cvalid)
        g_idx, g_empty = pointnet2.grid_ball_query(
            radius, ns, jnp.asarray(src), n, jnp.asarray(centers), cvalid,
            bounds=bounds, cell_cap=128)
        np.testing.assert_array_equal(np.asarray(g_idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(g_empty),
                                      np.asarray(ref_empty))

    multi = pointnet2.grid_ball_query_multi(
        (0.4, 0.9), (8, 16), jnp.asarray(src), n, jnp.asarray(centers),
        cvalid, bounds=bounds, cell_cap=128)
    for (radius, ns), (m_idx, m_empty) in zip(((0.4, 8), (0.9, 16)), multi):
        ref_idx, ref_empty = pointnet2.ball_query(
            radius, ns, jnp.asarray(src), n, jnp.asarray(centers), cvalid)
        np.testing.assert_array_equal(np.asarray(m_idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(m_empty),
                                      np.asarray(ref_empty))


def test_group_points():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    idx = jnp.asarray(np.array([[[0, 2], [3, 3]]], np.int32))
    out = np.asarray(pointnet2.group_points(feats, idx))
    np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[0, 0, 1], [6, 7, 8])
    np.testing.assert_array_equal(out[0, 1, 1], [9, 10, 11])


def test_three_nn_and_interpolate():
    src = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [99, 99, 99]]], np.float32)
    query = np.array([[[0.1, 0.1, 0.0]]], np.float32)
    dists, idx = pointnet2.three_nn(jnp.asarray(query), None,
                                    jnp.asarray(src), jnp.array([3]))
    idx = np.asarray(idx)[0, 0]
    assert set(idx.tolist()) == {0, 1, 2}  # padding point excluded
    w = pointnet2.three_nn_weights(dists)
    np.testing.assert_allclose(np.asarray(w).sum(), 1.0, rtol=1e-5)
    feats = jnp.asarray(np.array([[[1.0], [2.0], [3.0], [999.0]]], np.float32))
    out = np.asarray(pointnet2.three_interpolate(feats, jnp.asarray(idx)[None, None], w))
    assert 1.0 < out[0, 0, 0] < 3.0


def test_roipoint_pool3d():
    pts = np.array([[[0, 0, 0], [0.5, 0, 0], [-0.5, 0.2, 0.1],
                     [10, 10, 10], [0.1, 0.1, 0.1]]], np.float32)
    feats = np.arange(5, dtype=np.float32).reshape(1, 5, 1)
    rois = np.array([[[0, 0, 0, 2, 2, 2, 0.0],
                      [50, 50, 50, 2, 2, 2, 0.0]]], np.float32)
    pooled, empty = roi_pool.roipoint_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.array([5]),
        jnp.asarray(rois), jnp.ones((1, 2), bool), num_sampled_points=4)
    pooled = np.asarray(pooled)
    empty = np.asarray(empty)
    assert not empty[0, 0] and empty[0, 1]
    # first roi contains points 0,1,2,4 in index order
    np.testing.assert_allclose(pooled[0, 0, :, 3], [0, 1, 2, 4])
    np.testing.assert_allclose(pooled[0, 1], 0.0)


def test_roipoint_pool3d_repeats_when_fewer():
    pts = np.array([[[0, 0, 0], [0.5, 0, 0]]], np.float32)
    feats = np.array([[[7.0], [8.0]]], np.float32)
    rois = np.array([[[0, 0, 0, 2, 2, 2, 0.0]]], np.float32)
    pooled, empty = roi_pool.roipoint_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.array([2]),
        jnp.asarray(rois), jnp.ones((1, 1), bool), num_sampled_points=5)
    np.testing.assert_allclose(np.asarray(pooled)[0, 0, :, 3],
                               [7, 8, 7, 8, 7])  # modulo repeat


def test_roiaware_pool3d_max():
    # one roi at origin (2x2x2), grid 2x2x2: each octant gets its point
    pts = np.array([[[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5],
                     [0.5, -0.5, 0.5]]], np.float32)
    feats = np.array([[[1.0], [2.0], [3.0]]], np.float32)
    rois = np.array([[[0, 0, 0, 2, 2, 2, 0.0]]], np.float32)
    out = roi_pool.roiaware_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.array([3]),
        jnp.asarray(rois), jnp.ones((1, 1), bool), out_size=(2, 2, 2))
    out = np.asarray(out)[0, 0]  # (2, 2, 2, 1)
    assert out[0, 0, 0, 0] == 1.0   # (-x, -y, -z) octant
    assert out[1, 1, 1, 0] == 2.0
    assert out[1, 0, 1, 0] == 3.0
    assert out[0, 1, 0, 0] == 0.0   # empty cell -> 0


def test_roiaware_pool3d_rotated():
    # point ahead of a 90-deg rotated box maps into the rotated local frame
    pts = np.array([[[0.0, 0.9, 0.0]]], np.float32)  # +y world
    feats = np.array([[[5.0]]], np.float32)
    rois = np.array([[[0, 0, 0, 4, 2, 2, np.pi / 2]]], np.float32)
    out = roi_pool.roiaware_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.array([1]),
        jnp.asarray(rois), jnp.ones((1, 1), bool), out_size=(2, 2, 2))
    out = np.asarray(out)[0, 0]
    # world +y = local +x for heading pi/2 -> cell x=1
    assert out[1, :, :, 0].max() == 5.0
    assert out[0, :, :, 0].max() == 0.0
