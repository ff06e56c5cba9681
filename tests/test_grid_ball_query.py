"""grid_ball_query == ball_query (exact CPU path) whenever cell_cap holds.

The grid path only restricts WHICH candidates are examined (3x3x3 cells of
size radius); with a sufficient per-cell cap the surviving set and the
first-nsample-in-index-order selection are identical to the brute-force
semantics of ball_query_kernel (pointnet2_stack/src/ball_query_gpu.cu:16-40).
"""

import numpy as np
import pytest

from lidardetection_tpu.ops.pointnet2 import ball_query, grid_ball_query

BOUNDS = (0.0, -8.0, -2.0, 16.0, 8.0, 2.0)


def _cloud(rng, b, n):
    pts = np.stack([rng.uniform(0, 16, (b, n)), rng.uniform(-8, 8, (b, n)),
                    rng.uniform(-2, 2, (b, n))], axis=-1).astype(np.float32)
    return pts


@pytest.mark.parametrize('radius,nsample', [(0.8, 16), (1.6, 8), (3.0, 32)])
def test_matches_exact_ball_query(radius, nsample):
    rng = np.random.RandomState(0)
    b, n, m = 2, 512, 64
    src = _cloud(rng, b, n)
    centers = _cloud(rng, b, m)
    num = np.array([n, n - 100], np.int32)

    idx_ref, empty_ref = ball_query(radius, nsample, src, num, centers)
    idx_grid, empty_grid = grid_ball_query(
        radius, nsample, src, num, centers, bounds=BOUNDS, cell_cap=n)
    np.testing.assert_array_equal(np.asarray(empty_ref), np.asarray(empty_grid))
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_grid))


def test_center_validity_and_oob_centers():
    rng = np.random.RandomState(1)
    b, n, m = 1, 256, 16
    src = _cloud(rng, b, n)
    centers = _cloud(rng, b, m)
    centers[0, 0] = [40.0, 30.0, 9.0]  # far outside bounds -> clamped cell
    cvalid = np.ones((b, m), bool)
    cvalid[0, 1] = False
    num = np.array([n], np.int32)

    idx_ref, empty_ref = ball_query(1.2, 8, src, num, centers, cvalid)
    idx_grid, empty_grid = grid_ball_query(
        1.2, 8, src, num, centers, cvalid, bounds=BOUNDS, cell_cap=n)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_grid))
    np.testing.assert_array_equal(np.asarray(empty_ref), np.asarray(empty_grid))
    assert bool(empty_grid[0, 0]) and bool(empty_grid[0, 1])


def test_cap_drops_highest_index_candidates():
    # 10 coincident points; cap=4 keeps only the 4 lowest-index ones of the
    # cell, matching the documented drop semantics
    src = np.zeros((1, 10, 3), np.float32) + np.asarray([4.05, 0.05, 0.05])
    centers = src[:, :1].copy()
    num = np.array([10], np.int32)
    idx, empty = grid_ball_query(0.5, 8, src, num, centers,
                                 bounds=BOUNDS, cell_cap=4)
    got = np.asarray(idx)[0, 0]
    assert not bool(empty[0, 0])
    assert set(got[:4].tolist()) == {0, 1, 2, 3}
    assert set(got[4:].tolist()) == {0}  # back-filled with first hit


def test_kernel_row_run_path_matches_exact(monkeypatch):
    """The TPU row-run prep + Pallas ball_select (interpret mode) equals the
    exact brute-force ball_query when caps don't bind — pins the on-chip
    path's semantics (x-run merge: 3 consecutive-key cells per window)."""
    from lidardetection_tpu.ops import pointnet2 as p2

    monkeypatch.setattr(p2, '_FORCE_KERNEL_INTERPRET', True)
    rng = np.random.RandomState(2)
    b, n, m = 2, 512, 64
    src = _cloud(rng, b, n)
    centers = _cloud(rng, b, m)
    # push some centers outside bounds to exercise border-cell clamping
    centers[:, :4, 0] += 20.0
    num = np.array([n, n - 100], np.int32)

    for radii, nsamples in [((0.8,), (16,)), ((0.8, 1.6), (8, 16))]:
        refs = [ball_query(r, ns, src, num, centers)
                for r, ns in zip(radii, nsamples)]
        outs = p2.grid_ball_query_multi(
            radii, nsamples, src, num, centers, bounds=BOUNDS, cell_cap=n)
        for (idx_ref, empty_ref), (idx_g, empty_g) in zip(refs, outs):
            np.testing.assert_array_equal(np.asarray(empty_ref),
                                          np.asarray(empty_g))
            np.testing.assert_array_equal(np.asarray(idx_ref),
                                          np.asarray(idx_g))


def test_kernel_row_run_path_center_validity(monkeypatch):
    from lidardetection_tpu.ops import pointnet2 as p2

    monkeypatch.setattr(p2, '_FORCE_KERNEL_INTERPRET', True)
    rng = np.random.RandomState(3)
    b, n, m = 1, 256, 16
    src = _cloud(rng, b, n)
    centers = _cloud(rng, b, m)
    num = np.array([n], np.int32)
    cvalid = np.zeros((b, m), bool)
    cvalid[:, : m // 2] = True

    (idx, empty), = p2.grid_ball_query_multi(
        (1.0,), (8,), src, num, centers, new_xyz_valid=cvalid,
        bounds=BOUNDS, cell_cap=n)
    assert np.all(np.asarray(empty)[~cvalid])
    (idx_ref, empty_ref), = p2.grid_ball_query_multi(
        (1.0,), (8,), src, num, centers, new_xyz_valid=cvalid,
        bounds=BOUNDS, cell_cap=n)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
