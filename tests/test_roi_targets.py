"""RoI target/decode consistency (roi_head_utils).

The perfect-prediction round trip is the invariant that catches frame
mismatches the e2e loss tests cannot see: if rcnn_reg equals the
training targets exactly, generate_rcnn_boxes must reproduce the gt
boxes (up to the heading flip the targets quotient out). Round 5 found
the canonical heading target missing the `- roi_ry` subtraction
(roi_head_template.py:118) precisely because no such invariant test
existed — the reg loss silently fought the flip-invariant corner loss.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.core.box_coders import build_box_coder
from lidardetection_tpu.models.roi_heads import roi_head_utils

SAMPLER_CFG = {
    'ROI_PER_IMAGE': 16,
    'FG_RATIO': 0.5,
    'SAMPLE_ROI_BY_EACH_CLASS': True,
    'CLS_SCORE_TYPE': 'roi_iou',
    'CLS_FG_THRESH': 0.75,
    'CLS_BG_THRESH': 0.25,
    'CLS_BG_THRESH_LO': 0.1,
    'HARD_BG_RATIO': 0.8,
    'REG_FG_THRESH': 0.55,
}


def _make_batch(rng, n_roi=24, n_gt=6):
    # gt boxes scattered with random headings; rois = jittered gt so the
    # sampler finds high-IoU matches
    gts = np.zeros((1, n_gt, 8), np.float32)
    gts[0, :, 0] = rng.uniform(0, 40, n_gt)
    gts[0, :, 1] = rng.uniform(-20, 20, n_gt)
    gts[0, :, 2] = rng.uniform(-1, 0, n_gt)
    gts[0, :, 3] = rng.uniform(1.5, 4.2, n_gt)
    gts[0, :, 4] = rng.uniform(0.6, 1.8, n_gt)
    gts[0, :, 5] = rng.uniform(1.4, 1.8, n_gt)
    gts[0, :, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    gts[0, :, 7] = rng.integers(1, 4, n_gt)

    reps = n_roi // n_gt + 1
    rois = np.tile(gts[:, :, :7], (1, reps, 1))[:, :n_roi].copy()
    rois[0, :, 0:3] += rng.normal(0, 0.1, (n_roi, 3))
    rois[0, :, 6] += rng.normal(0, 0.1, n_roi)
    labels = np.tile(gts[:, :, 7], (1, reps))[:, :n_roi].astype(np.int32)
    return {
        'rois': jnp.asarray(rois),
        'roi_scores': jnp.asarray(rng.uniform(0.5, 1, (1, n_roi)),
                                  jnp.float32),
        'roi_labels': jnp.asarray(labels),
        'roi_valid': jnp.ones((1, n_roi), bool),
        'gt_boxes': jnp.asarray(gts),
    }


def test_canonical_heading_is_roi_relative():
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    t = roi_head_utils.assign_roi_targets(
        jax.random.PRNGKey(0), batch, SAMPLER_CFG)
    fg = np.asarray(t['reg_valid_mask'][0]) > 0
    assert fg.sum() >= 4
    rois = np.asarray(t['rois'][0])[fg]
    gt = np.asarray(t['gt_of_rois_src'][0])[fg]
    canon = np.asarray(t['gt_of_rois'][0])[fg]
    # rois are gt +- 0.1 rad, so the roi-relative heading must be small
    # (mod the pi flip) — NOT the raw gt heading
    dh = canon[:, 6]
    assert np.abs(dh).max() < 0.5, dh
    expect = np.arctan2(np.sin(gt[:, 6] - rois[:, 6]),
                        np.cos(gt[:, 6] - rois[:, 6]))
    expect = np.where(expect > np.pi / 2, expect - np.pi, expect)
    expect = np.where(expect < -np.pi / 2, expect + np.pi, expect)
    np.testing.assert_allclose(dh, expect, atol=1e-4)


def test_perfect_prediction_roundtrip():
    """rcnn_reg == training targets => decoded boxes == gt (mod pi flip)."""
    rng = np.random.default_rng(1)
    batch = _make_batch(rng)
    t = roi_head_utils.assign_roi_targets(
        jax.random.PRNGKey(0), batch, SAMPLER_CFG)
    coder = build_box_coder('ResidualCoder')
    rois = t['rois']
    gt_ct = t['gt_of_rois'][..., 0:7]
    b, r = rois.shape[:2]
    anchor = rois[..., 0:7].reshape(-1, 7)
    anchor = anchor.at[:, 0:3].set(0).at[:, 6].set(0)
    targets = coder.encode(gt_ct.reshape(-1, 7), anchor).reshape(b, r, 7)

    _, decoded = roi_head_utils.generate_rcnn_boxes(
        rois, jnp.zeros((b, r, 1)), targets, coder)
    fg = np.asarray(t['reg_valid_mask'][0]) > 0
    dec = np.asarray(decoded[0])[fg]
    gt = np.asarray(t['gt_of_rois_src'][0])[fg]
    np.testing.assert_allclose(dec[:, 0:6], gt[:, 0:6], atol=1e-3)
    dh = np.arctan2(np.sin(dec[:, 6] - gt[:, 6]), np.cos(dec[:, 6] - gt[:, 6]))
    # heading matches up to the pi flip the canonical targets quotient out
    dh = np.where(dh > np.pi / 2, dh - np.pi, dh)
    dh = np.where(dh < -np.pi / 2, dh + np.pi, dh)
    np.testing.assert_allclose(dh, 0, atol=1e-3)
