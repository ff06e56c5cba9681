import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.ops import voxelize

PC_RANGE = (0.0, -4.0, -3.0, 8.0, 4.0, 1.0)
VSZ = (0.5, 0.5, 4.0)


def test_grid_size():
    grid = voxelize.grid_size_from_range(PC_RANGE, VSZ)
    np.testing.assert_array_equal(grid, [16, 16, 1])


def _rand_points(n=500, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.concatenate(
        [rng.rand(n, 1) * 10 - 1,       # x, some out of range
         rng.rand(n, 1) * 10 - 5,       # y
         rng.rand(n, 1) * 5 - 3.5,      # z
         rng.rand(n, 1)], axis=1        # intensity
    ).astype(np.float32)
    return pts


def test_voxelize_np_basic():
    pts = np.array([
        [0.1, 0.1, 0.0, 1.0],
        [0.2, 0.2, 0.0, 2.0],
        [0.3, 0.1, 0.0, 3.0],   # same voxel as above two
        [5.0, 1.0, 0.0, 4.0],   # different voxel
        [100.0, 0.0, 0.0, 5.0], # out of range
    ], dtype=np.float32)
    voxels, coords, npts, nv = voxelize.voxelize_np(pts, PC_RANGE, VSZ, 2, 10)
    assert nv == 2
    np.testing.assert_array_equal(npts[:2], [2, 1])  # capped at 2 points
    np.testing.assert_array_equal(coords[0], [0, 8, 0])  # z, y, x
    np.testing.assert_array_equal(coords[1], [0, 10, 10])
    np.testing.assert_allclose(voxels[0, 0], pts[0])
    np.testing.assert_allclose(voxels[0, 1], pts[1])  # first-come kept


def test_voxelize_jax_matches_np():
    pts = _rand_points(400)
    v_np, c_np, n_np, nv_np = voxelize.voxelize_np(pts, PC_RANGE, VSZ, 8, 256)
    v_j, c_j, n_j, nv_j = voxelize.voxelize_jax(
        jnp.asarray(pts), jnp.int32(400), PC_RANGE, VSZ, 8, 256)
    assert int(nv_j) == nv_np
    # same voxel set (order may differ): compare as dicts keyed by coords
    def as_map(v, c, n, nv):
        return {tuple(c[i]): (np.sort(v[i, :n[i]], axis=0), n[i]) for i in range(nv)}
    m_np = as_map(v_np, c_np, n_np, nv_np)
    m_j = as_map(np.asarray(v_j), np.asarray(c_j), np.asarray(n_j), int(nv_j))
    assert set(m_np) == set(m_j)
    for k in m_np:
        assert m_np[k][1] == m_j[k][1], k
        np.testing.assert_allclose(m_np[k][0], m_j[k][0], atol=1e-6)


def test_voxelize_jax_respects_num_valid():
    pts = _rand_points(100)
    out_full = voxelize.voxelize_jax(jnp.asarray(pts), jnp.int32(100), PC_RANGE, VSZ, 4, 64)
    out_half = voxelize.voxelize_jax(jnp.asarray(pts), jnp.int32(50), PC_RANGE, VSZ, 4, 64)
    assert int(out_half[3]) <= int(out_full[3])
    # padded tail beyond num_valid ignored entirely
    pts2 = pts.copy()
    pts2[50:] = 99999.0
    out_half2 = voxelize.voxelize_jax(jnp.asarray(pts2), jnp.int32(50), PC_RANGE, VSZ, 4, 64)
    np.testing.assert_allclose(np.asarray(out_half[0]), np.asarray(out_half2[0]))


def test_voxelize_max_voxels_cap():
    pts = _rand_points(500, seed=1)
    v, c, n, nv = voxelize.voxelize_np(pts, PC_RANGE, VSZ, 4, 8)
    assert nv == 8
    v_j, c_j, n_j, nv_j = voxelize.voxelize_jax(
        jnp.asarray(pts), jnp.int32(500), PC_RANGE, VSZ, 4, 8)
    assert int(nv_j) == 8
