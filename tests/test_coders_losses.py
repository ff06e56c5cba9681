import jax
import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.core import losses
from lidardetection_tpu.core.box_coders import (
    PointResidualCoder,
    ResidualCoder,
    build_box_coder,
)


def _rand_boxes(rng, n, extra=0):
    return np.concatenate(
        [rng.randn(n, 3) * 5,
         rng.rand(n, 3) * 3 + 0.5,
         rng.randn(n, 1),
         rng.randn(n, extra)], axis=1
    ).astype(np.float32)


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(_rand_boxes(rng, 32))
    anchors = jnp.asarray(_rand_boxes(rng, 32))
    for sincos in (False, True):
        coder = ResidualCoder(encode_angle_by_sincos=sincos)
        enc = coder.encode(boxes, anchors)
        dec = coder.decode(enc, anchors)
        np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]),
                                   rtol=1e-4, atol=1e-4)
        # heading round-trips modulo 2*pi (exactly when not sincos)
        dr = np.asarray(jnp.cos(dec[:, 6] - boxes[:, 6]))
        np.testing.assert_allclose(dr, 1.0, atol=1e-4)


def test_residual_coder_velocity_extras():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(_rand_boxes(rng, 8, extra=2))  # nuscenes-style vx, vy
    anchors = jnp.asarray(_rand_boxes(rng, 8, extra=2))
    coder = ResidualCoder(code_size=9)
    enc = coder.encode(boxes, anchors)
    assert enc.shape == (8, 9)
    dec = coder.decode(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec[:, 7:]), np.asarray(boxes[:, 7:]), atol=1e-4)


def test_point_residual_coder_roundtrip():
    rng = np.random.RandomState(2)
    boxes = jnp.asarray(_rand_boxes(rng, 16))
    points = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    classes = jnp.asarray(rng.randint(1, 4, 16))
    coder = PointResidualCoder(mean_size=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)))
    enc = coder.encode(boxes, points, classes)
    assert enc.shape == (16, 8)
    dec = coder.decode(enc, points, classes)
    np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]), rtol=1e-4, atol=1e-4)


def test_build_box_coder():
    coder = build_box_coder('ResidualCoder', code_size=7, encode_angle_by_sincos=True)
    assert coder.full_code_size == 8


def test_focal_loss_matches_reference_formula():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    targets = jax.nn.one_hot(jnp.asarray(rng.randint(0, 3, (2, 5))), 3)
    weights = jnp.asarray(rng.rand(2, 5).astype(np.float32))
    out = np.asarray(losses.sigmoid_focal_loss(logits, targets, weights))
    # reference formula (loss_utils.py:44-72) in numpy
    x, z, w = np.asarray(logits), np.asarray(targets), np.asarray(weights)
    p = 1 / (1 + np.exp(-x))
    alpha_w = z * 0.25 + (1 - z) * 0.75
    pt = z * (1 - p) + (1 - z) * p
    bce = np.clip(x, 0, None) - x * z + np.log1p(np.exp(-np.abs(x)))
    expect = alpha_w * pt**2 * bce * w[..., None]
    np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-5)


def test_smooth_l1_loss():
    preds = jnp.array([[[0.0, 1.0]]])
    targets = jnp.array([[[0.05, jnp.nan]]])  # nan target ignored
    out = np.asarray(losses.weighted_smooth_l1_loss(preds, targets, beta=1.0 / 9.0))
    np.testing.assert_allclose(out[0, 0, 0], 0.5 * 0.05**2 / (1.0 / 9.0), rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 1], 0.0, atol=1e-7)


def test_weighted_cross_entropy():
    logits = jnp.array([[[2.0, 0.0, 0.0]]])
    one_hot = jnp.array([[[1.0, 0.0, 0.0]]])
    w = jnp.array([[2.0]])
    out = np.asarray(losses.weighted_cross_entropy_loss(logits, one_hot, w))
    expect = -np.log(np.exp(2) / (np.exp(2) + 2)) * 2
    np.testing.assert_allclose(out, [[expect]], rtol=1e-3)


def test_corner_loss_zero_for_identical():
    boxes = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    out = np.asarray(losses.corner_loss_lidar(boxes, boxes))
    np.testing.assert_allclose(out, [0.0], atol=1e-6)


def test_corner_loss_flip_invariant():
    boxes = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    flipped = boxes.at[:, 6].add(jnp.pi)
    out = np.asarray(losses.corner_loss_lidar(boxes, flipped))
    np.testing.assert_allclose(out, [0.0], atol=1e-5)


def test_corner_loss_grad_finite_at_zero_distance():
    """d||x||/dx is NaN at 0; the eps-guarded corner loss must not be —
    an overfit run CONVERGES into pred corners == gt corners (observed as
    a late-training NaN blowup in the PV-RCNN train-to-AP harness)."""
    import jax
    import jax.numpy as jnp
    from lidardetection_tpu.core import losses

    gt = jnp.asarray([[10.0, 5.0, -1.0, 4.0, 1.8, 1.6, 0.3]])

    def f(boxes):
        return losses.corner_loss_lidar(boxes, gt).sum()

    g = jax.grad(f)(gt)  # pred == gt exactly
    assert bool(jnp.all(jnp.isfinite(g))), g
