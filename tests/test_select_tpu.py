"""Interpret-mode contract test for the Pallas ball-select kernel
(ops/select_tpu.py) against the XLA two-stage top_k selection it replaces."""

import jax
import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.ops import pointnet2 as p2
from lidardetection_tpu.ops.select_tpu import ball_select


def test_ball_select_matches_topk_selection():
    rng = np.random.default_rng(0)
    n, m, n_off, cap = 96, 21, 5, 8
    radii, nsamples = (0.8, 1.6), (4, 6)

    src_sorted = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    centers = jnp.asarray(rng.uniform(-3, 3, (m, 3)).astype(np.float32))
    # DISJOINT runs per row (one cap-block each), like real cell runs — a
    # source point is live in at most one window, so finite scores are
    # unique per row (the kernel's uniqueness precondition)
    blocks = np.stack([rng.permutation(n // cap)[:n_off] for _ in range(m)])
    start = (blocks * cap + rng.integers(0, 3, (m, n_off))).astype(np.int32)
    end = start + rng.integers(0, cap - 2, (m, n_off))
    start, end = jnp.asarray(start), jnp.asarray(end.astype(np.int32))

    cx, cy, cz, orig, pos = p2._overlapped_candidates(
        src_sorted, order, start, cap)
    live = (pos >= start[..., None]) & (pos < end[..., None])
    d2 = ((cx - centers[:, None, None, 0]) ** 2
          + (cy - centers[:, None, None, 1]) ** 2
          + (cz - centers[:, None, None, 2]) ** 2)
    neg_orig = -orig.astype(jnp.float32)

    expected = []
    for radius, ns in zip(radii, nsamples):
        hit = live & (d2 < radius ** 2)
        score = jnp.where(hit, neg_orig, -jnp.inf)
        top, _ = jax.lax.top_k(score.reshape(m, -1), ns)
        expected.append(np.asarray(top))

    cand, _ = p2._candidate_windows(src_sorted, order, start, cap)
    nb = -(-n // cap) + 2
    got = ball_select(cand, start, end, centers, radii, nsamples, cap, nb,
                      interpret=True)
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, np.asarray(g))
