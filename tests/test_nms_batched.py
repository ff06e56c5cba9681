"""Property test: nms_bev_batched == per-sample nms_bev.

The blocked batched greedy NMS (core/iou3d.py:_blocked_greedy_nms_batched)
is used by every eval path; this pins its semantics — including the
assume_sorted fast path — to the per-sample reference implementation on
random rotated boxes with validity masks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.core.iou3d import nms_bev, nms_bev_batched


def _random_boxes(rng, b, n):
    xy = rng.rand(b, n, 2).astype(np.float32) * 40
    z = rng.randn(b, n, 1).astype(np.float32)
    dxdy = 1.0 + rng.rand(b, n, 2).astype(np.float32) * 3.0
    dz = 1.0 + rng.rand(b, n, 1).astype(np.float32)
    ry = (rng.rand(b, n, 1).astype(np.float32) - 0.5) * 2 * np.pi
    return np.concatenate([xy, z, dxdy, dz, ry], axis=2)


@pytest.mark.parametrize('thresh,pre,post', [(0.1, 64, 16), (0.5, 128, 32)])
def test_batched_matches_per_sample(thresh, pre, post):
    rng = np.random.RandomState(0)
    b, n = 6, 128
    boxes = _random_boxes(rng, b, n)
    scores = rng.rand(b, n).astype(np.float32)
    valid = rng.rand(b, n) > 0.2

    idx_b, mask_b, num_b = nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), thresh, pre, post,
        valid_mask=jnp.asarray(valid))
    for i in range(b):
        idx_s, mask_s, num_s = nms_bev(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), thresh, pre,
            post, valid_mask=jnp.asarray(valid[i]))
        assert int(num_b[i]) == int(num_s)
        k = int(num_s)
        np.testing.assert_array_equal(np.asarray(idx_b[i][:k]),
                                      np.asarray(idx_s[:k]))
        np.testing.assert_array_equal(np.asarray(mask_b[i]),
                                      np.asarray(mask_s))


def test_batched_assume_sorted_matches():
    """assume_sorted path (pre == N, scores descending) == sorted path."""
    rng = np.random.RandomState(1)
    b, n, post = 5, 96, 24
    boxes = _random_boxes(rng, b, n)
    scores = np.sort(rng.rand(b, n).astype(np.float32), axis=1)[:, ::-1]
    scores = np.ascontiguousarray(scores)
    valid = np.ones((b, n), bool)
    # invalid rows at the tail, as the deferred-decode caller guarantees
    valid[:, n - 10:] = False

    idx_a, mask_a, num_a = nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, n, post,
        valid_mask=jnp.asarray(valid), assume_sorted=True)
    idx_r, mask_r, num_r = nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, n, post,
        valid_mask=jnp.asarray(valid), assume_sorted=False)
    np.testing.assert_array_equal(np.asarray(num_a), np.asarray(num_r))
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_r))
    for i in range(b):
        k = int(num_a[i])
        # sorted input: positional indices ARE score-order indices
        np.testing.assert_array_equal(np.asarray(idx_a[i][:k]),
                                      np.asarray(idx_r[i][:k]))


def test_batched_degenerate_all_invalid():
    rng = np.random.RandomState(2)
    boxes = _random_boxes(rng, 2, 32)
    scores = rng.rand(2, 32).astype(np.float32)
    valid = np.zeros((2, 32), bool)
    idx, mask, num = nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 32, 8,
        valid_mask=jnp.asarray(valid))
    assert int(num.sum()) == 0
    assert not bool(mask.any())
