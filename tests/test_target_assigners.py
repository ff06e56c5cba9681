"""Target assigner unit tests (axis-aligned + ATSS)."""

import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.core.box_coders import ResidualCoder
from lidardetection_tpu.models.dense_heads import target_assigner


def make_anchor_grid():
    # 10x10 grid of car-sized anchors at z=-1, heading 0
    xs, ys = np.meshgrid(np.arange(10) * 4.0, np.arange(10) * 4.0)
    anchors = np.zeros((100, 7), np.float32)
    anchors[:, 0] = xs.flatten()
    anchors[:, 1] = ys.flatten()
    anchors[:, 2] = -1.0
    anchors[:, 3:6] = [3.9, 1.6, 1.56]
    return anchors


def test_axis_aligned_assigner_basic():
    anchors = jnp.asarray(make_anchor_grid())
    anchor_class = jnp.zeros(100, jnp.int32)
    matched_t = jnp.full(100, 0.6)
    unmatched_t = jnp.full(100, 0.45)
    # one gt exactly on anchor (5, 5) -> index 5*10+5 = 55
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [20.0, 20.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1.0]
    out = target_assigner.assign_targets(
        anchors, anchor_class, matched_t, unmatched_t, jnp.asarray(gt),
        box_coder=ResidualCoder(), match_height=False)
    labels = np.asarray(out['box_cls_labels'])[0]
    assert labels[55] == 1  # exact match -> fg
    assert (labels == 1).sum() == 1
    assert (labels == 0).sum() == 99  # others background
    # reg target at the match is ~zero residual
    np.testing.assert_allclose(
        np.asarray(out['box_reg_targets'])[0, 55], 0.0, atol=1e-5)
    assert np.asarray(out['reg_weights'])[0, 55] == 1.0


def test_axis_aligned_force_match_low_iou():
    anchors = jnp.asarray(make_anchor_grid())
    anchor_class = jnp.zeros(100, jnp.int32)
    matched_t = jnp.full(100, 0.6)
    unmatched_t = jnp.full(100, 0.45)
    # tiny same-class gt (low IoU) still force-matches its best anchor
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [20.0, 20.0, -1.0, 0.5, 0.5, 0.5, 0.0, 1.0]
    out = target_assigner.assign_targets(
        anchors, anchor_class, matched_t, unmatched_t, jnp.asarray(gt),
        box_coder=ResidualCoder(), match_height=False)
    labels = np.asarray(out['box_cls_labels'])[0]
    assert labels[55] == 1


def test_axis_aligned_class_compat():
    anchors = jnp.asarray(make_anchor_grid())
    anchor_class = jnp.zeros(100, jnp.int32)  # all class-0 anchors
    matched_t = jnp.full(100, 0.6)
    unmatched_t = jnp.full(100, 0.45)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [20.0, 20.0, -1.0, 3.9, 1.6, 1.56, 0.0, 2.0]  # class 2 gt
    out = target_assigner.assign_targets(
        anchors, anchor_class, matched_t, unmatched_t, jnp.asarray(gt),
        box_coder=ResidualCoder(), match_height=False)
    labels = np.asarray(out['box_cls_labels'])[0]
    # class-2 gt cannot match class-0 anchors at all
    assert (labels > 0).sum() == 0


def test_atss_assigner():
    anchors = jnp.asarray(make_anchor_grid())
    gt = np.zeros((2, 4, 8), np.float32)
    gt[0, 0] = [20.0, 20.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1.0]
    gt[1, 0] = [8.0, 8.0, -1.0, 3.9, 1.6, 1.56, 0.0, 3.0]
    gt[1, 1] = [36.0, 36.0, -1.0, 3.9, 1.6, 1.56, 0.0, 2.0]
    out = target_assigner.atss_assign_targets(
        anchors, jnp.asarray(gt), box_coder=ResidualCoder(), topk=9,
        match_height=False)
    labels = np.asarray(out['box_cls_labels'])
    assert labels[0, 55] == 1
    assert labels[1, 22] == 3  # anchor at (8, 8) = idx 2*10+2
    assert labels[1, 99] == 2  # anchor at (36, 36)
    # padded gt rows assign nothing extra
    assert set(np.unique(labels[0])) <= {0, 1}
    assert set(np.unique(labels[1])) <= {0, 2, 3}
    w = np.asarray(out['reg_weights'])
    assert w[0, 55] == 1.0 and w[1, 22] == 1.0
