"""Axis-aligned anchor target assignment — single fully-vectorized pass.

Re-expresses pcdet's AxisAlignedTargetAssigner
(axis_aligned_target_assigner.py:36-218) TPU-first: the reference loops over
batch and classes in Python with a CPU argmax round-trip (:150-155); here one
vmapped, masked computation covers all (batch, class) pairs inside jit.

Semantics reproduced exactly per sample/class (refs into the file above):
  * IoU = nearest-BEV (box_utils.boxes3d_nearest_bev_iou) or 3D
    (boxes_iou3d_gpu) when MATCH_HEIGHT (:147-148);
  * force-match: every anchor achieving a gt's best IoU gets that anchor's
    own argmax gt (:160-163), skipped for gts whose best IoU is 0 (:157-158);
  * fg if max IoU >= matched_threshold (:165-168);
  * bg if max IoU < unmatched_threshold, but force-match overrides bg
    (:192-193); in-between and non-forced -> ignore (-1);
  * reg targets: box_coder.encode(argmax-gt, anchor) for fg anchors (:195-202);
  * reg weight 1 for fg (:204-211; NORM_BY_NUM_EXAMPLES unused by the shipped
    configs).

POS_FRACTION subsampling (:175-187) is None in every shipped config and is
not implemented (asserted at build time in the head).
"""

import functools

import jax
import jax.numpy as jnp

from ...core.iou3d import boxes3d_nearest_bev_iou, boxes_iou3d


def _assign_single(anchors, anchor_class, matched_t, unmatched_t, gt_boxes,
                   gt_classes, box_coder, match_height):
    """Assign targets for one sample over the full flat anchor set.

    Args:
        anchors: (A, D) flat anchors; anchor_class: (A,) int32 0-based;
        matched_t/unmatched_t: (A,) per-anchor thresholds;
        gt_boxes: (G, D) padded; gt_classes: (G,) int32 1-based, 0 = pad.
    Returns:
        labels (A,) int32 (-1 ignore / 0 bg / class id),
        reg_targets (A, code_size), reg_weights (A,).
    """
    gt_valid = gt_classes > 0  # (G,)
    # class-compatibility mask: anchor of class c only matches gt of class c
    compat = (gt_classes[None, :] - 1) == anchor_class[:, None]  # (A, G)
    if match_height:
        iou = boxes_iou3d(anchors[:, :7], gt_boxes[:, :7])
    else:
        iou = boxes3d_nearest_bev_iou(anchors[:, :7], gt_boxes[:, :7])
    iou = jnp.where(compat & gt_valid[None, :], iou, -1.0)  # (A, G)

    a2g_max = iou.max(axis=1)
    a2g_arg = iou.argmax(axis=1)
    g2a_max = iou.max(axis=0)  # (G,)

    force = (iou == g2a_max[None, :]) & (g2a_max > 0)[None, :]  # (A, G)
    force_any = force.any(axis=1)

    fg = (a2g_max >= matched_t) | force_any
    bg = a2g_max < unmatched_t
    labels = jnp.where(fg, gt_classes[a2g_arg], jnp.where(bg, 0, -1)).astype(jnp.int32)

    matched_gt = gt_boxes[a2g_arg]  # (A, D)
    reg = box_coder.encode(matched_gt, anchors)
    reg_targets = jnp.where(fg[:, None], reg, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights


@functools.partial(jax.jit, static_argnames=('box_coder', 'match_height'))
def assign_targets(flat_anchors, anchor_class, matched_t, unmatched_t,
                   gt_boxes, box_coder, match_height=False):
    """Batched target assignment.

    Args:
        flat_anchors: (A, D); anchor_class: (A,); matched_t/unmatched_t: (A,);
        gt_boxes: (B, G, D+1) with class id in the last column (0 = padding).
    Returns:
        dict: box_cls_labels (B, A) int32, box_reg_targets (B, A, code),
        reg_weights (B, A).
    """
    gt = gt_boxes[..., :-1]
    gt_cls = gt_boxes[..., -1].astype(jnp.int32)
    labels, reg_targets, reg_weights = jax.vmap(
        lambda g, c: _assign_single(
            flat_anchors, anchor_class, matched_t, unmatched_t, g, c,
            box_coder, match_height)
    )(gt, gt_cls)
    return {
        'box_cls_labels': labels,
        'box_reg_targets': reg_targets,
        'reg_weights': reg_weights,
    }
