"""Goldens for the RoI-grid-pool candidate query (ops.pointnet2.roi_candidates
+ candidate_rank_select) against the brute-force ball_query contract
(pointnet2_stack/src/ball_query_gpu.cu:16-40 semantics)."""

import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.models.roi_heads.pvrcnn_head import (
    get_global_grid_points_of_roi,
)
from lidardetection_tpu.ops import pointnet2 as p2


def _random_scene(rng, n=256, r=5):
    pts = rng.uniform(-10, 10, size=(1, n, 3)).astype(np.float32)
    rois = np.zeros((1, r, 7), np.float32)
    rois[..., 0:3] = rng.uniform(-8, 8, size=(1, r, 3))
    rois[..., 3:6] = rng.uniform(1.0, 4.0, size=(1, r, 3))
    rois[..., 6] = rng.uniform(-np.pi, np.pi, size=(1, r))
    return jnp.asarray(pts), jnp.asarray(rois)


def test_roi_candidate_query_matches_brute_ball_query():
    rng = np.random.default_rng(0)
    pts, rois = _random_scene(rng)
    n = pts.shape[1]
    num = jnp.asarray([n], jnp.int32)
    g = 4
    grid = get_global_grid_points_of_roi(rois, g)  # (1, R, g^3, 3)
    rr, gg = grid.shape[1:3]

    for radius, nsample in ((0.8, 8), (1.6, 16)):
        r_cand = 0.5 * jnp.linalg.norm(rois[..., 3:6], axis=-1) + radius
        # K = n => no candidate overflow => exact
        cand_idx, cand_live = p2.roi_candidates(
            pts, num, rois[..., 0:3], r_cand, n)
        cand_xyz = p2.group_points(
            pts, cand_idx.reshape(1, -1)).reshape(1, rr, n, 3)
        sel, empty = p2.candidate_rank_select(
            cand_xyz, cand_live, grid, radius, nsample)
        idx = jnp.einsum('brgsk,brk->brgs', sel.astype(jnp.float32),
                         cand_idx.astype(jnp.float32)).astype(jnp.int32)

        ref_idx, ref_empty = p2.ball_query(
            radius, nsample, pts, num, grid.reshape(1, rr * gg, 3))
        np.testing.assert_array_equal(
            np.asarray(empty).reshape(-1), np.asarray(ref_empty).reshape(-1))
        np.testing.assert_array_equal(
            np.asarray(idx).reshape(rr * gg, nsample),
            np.asarray(ref_idx).reshape(rr * gg, nsample))


def test_roi_candidates_cap_keeps_lowest_indices():
    rng = np.random.default_rng(1)
    pts, rois = _random_scene(rng, n=128, r=2)
    num = jnp.asarray([128], jnp.int32)
    r_cand = 0.5 * jnp.linalg.norm(rois[..., 3:6], axis=-1) + 20.0  # all hit
    k = 16
    cand_idx, cand_live = p2.roi_candidates(
        pts, num, rois[..., 0:3], r_cand, k)
    assert bool(cand_live.all())
    # lowest-index points win the cap, ascending order
    np.testing.assert_array_equal(
        np.asarray(cand_idx)[0, 0], np.arange(k))
