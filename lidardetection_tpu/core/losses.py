"""Detection losses in JAX (functional, no modules).

Mirrors pcdet/utils/loss_utils.py:
  * sigmoid_focal_loss            — SigmoidFocalClassificationLoss (:9-72)
  * weighted_smooth_l1_loss       — WeightedSmoothL1Loss (:75-136)
  * weighted_l1_loss              — WeightedL1Loss (:139-178)
  * weighted_cross_entropy_loss   — WeightedCrossEntropyLoss (:181-206)
  * corner_loss_lidar             — get_corner_loss_lidar (:209-232)

All are elementwise/unreduced like the reference; callers apply the
normalizers. Everything is pure and grad-safe.
"""

import jax
import jax.numpy as jnp

from .geometry import boxes_to_corners_3d


def sigmoid_cross_entropy_with_logits(logits, labels):
    """max(x,0) - x*z + log1p(exp(-|x|)) (loss_utils.py:25-42)."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Sigmoid focal loss, unreduced (loss_utils.py:44-72).

    Args:
        logits: (B, N, C); targets: (B, N, C) one-hot; weights: (B, N).
    Returns:
        (B, N, C)
    """
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = sigmoid_cross_entropy_with_logits(logits, targets)
    loss = focal_weight * bce
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1(diff, beta):
    """Huber-style smooth-L1 on a residual (loss_utils.py:100-107)."""
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights=None, beta=1.0 / 9.0, code_weights=None):
    """Unreduced smooth-L1 with per-code and per-anchor weights (loss_utils.py:109-136)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1_loss(preds, targets, weights=None, code_weights=None):
    """Unreduced L1 (loss_utils.py:151-178)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy_loss(logits, one_hot_targets, weights):
    """Softmax CE against argmax of one-hot, anchor-weighted (loss_utils.py:189-206)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * log_probs, axis=-1)
    return loss * weights


def _safe_norm(x, axis):
    """||x|| with zero (not NaN) gradient at ||x|| = 0.

    d||x||/dx = x/||x|| is NaN at exactly zero — which an overfit run
    CONVERGES INTO (predicted corners land on gt corners; observed as a
    late-training NaN blowup in the PV-RCNN train-to-AP harness). The
    max() gate routes the gradient to the constant branch below eps.
    """
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


def corner_loss_lidar(pred_boxes, gt_boxes):
    """Flip-invariant 8-corner smooth-L1 loss, (N,) (loss_utils.py:209-232)."""
    pred_corners = boxes_to_corners_3d(pred_boxes)
    gt_corners = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_corners_flip = boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        _safe_norm(pred_corners - gt_corners, 2),
        _safe_norm(pred_corners - gt_corners_flip, 2),
    )  # (N, 8)
    return smooth_l1(dist, beta=1.0).mean(axis=1)
