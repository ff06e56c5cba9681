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
                   gt_classes, box_coder, match_height, gt_boxes_enlarged=None):
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

    # regression encodes the (optionally multiframe-enlarged) gt while the
    # matching above used the original boxes (assign_targets_single:196-202)
    reg_src = gt_boxes if gt_boxes_enlarged is None else gt_boxes_enlarged
    matched_gt = reg_src[a2g_arg]  # (A, D)
    reg = box_coder.encode(matched_gt, anchors)
    reg_targets = jnp.where(fg[:, None], reg, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights


@functools.partial(jax.jit, static_argnames=('box_coder', 'match_height'))
def assign_targets(flat_anchors, anchor_class, matched_t, unmatched_t,
                   gt_boxes, box_coder, match_height=False,
                   gt_boxes_enlarged=None):
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
    if gt_boxes_enlarged is None:
        labels, reg_targets, reg_weights = jax.vmap(
            lambda g, c: _assign_single(
                flat_anchors, anchor_class, matched_t, unmatched_t, g, c,
                box_coder, match_height)
        )(gt, gt_cls)
    else:
        labels, reg_targets, reg_weights = jax.vmap(
            lambda g, c, ge: _assign_single(
                flat_anchors, anchor_class, matched_t, unmatched_t, g, c,
                box_coder, match_height, gt_boxes_enlarged=ge)
        )(gt, gt_cls, gt_boxes_enlarged[..., :gt.shape[-1]])
    return {
        'box_cls_labels': labels,
        'box_reg_targets': reg_targets,
        'reg_weights': reg_weights,
    }


def _atss_assign_single(anchors, gt_boxes, gt_classes, box_coder, topk,
                        match_height):
    """ATSS assignment for one sample (atss_target_assigner.py:75-141,
    https://arxiv.org/abs/1912.02424), fully vectorized with masked padded gt.
    """
    from ...core.geometry import rotate_points_along_z

    a = anchors.shape[0]
    g = gt_boxes.shape[0]
    gt_valid = gt_classes > 0
    if match_height:
        ious = boxes_iou3d(anchors[:, :7], gt_boxes[:, :7])
    else:
        from ...core.iou3d import boxes_iou_bev
        ious = boxes_iou_bev(anchors[:, :7], gt_boxes[:, :7])
    ious = jnp.where(gt_valid[None, :], ious, 0.0)  # (A, G)

    dist = jnp.linalg.norm(anchors[:, None, 0:3] - gt_boxes[None, :, 0:3],
                           axis=-1)  # (A, G)
    k = min(topk, a)
    _, topk_idxs = jax.lax.top_k(-dist.T, k)  # (G, K) nearest anchors per gt
    cand_ious = jnp.take_along_axis(ious.T, topk_idxs, axis=1)  # (G, K)
    iou_mean = cand_ious.mean(axis=1)
    iou_std = cand_ious.std(axis=1, ddof=1)  # torch.std is unbiased
    iou_thresh = iou_mean + iou_std + 1e-6
    is_pos = cand_ious >= iou_thresh[:, None]  # (G, K)

    # anchor center inside gt BEV footprint; the reference compares
    # (x_local, y_local) against (dy, dx)/2 — the swapped order with its
    # "bugfixed" comment (atss_target_assigner.py:108-111) — reproduced as-is
    cand_anchors = anchors[topk_idxs]  # (G, K, 7+)
    local = cand_anchors[..., 0:3] - gt_boxes[:, None, 0:3]
    local = rotate_points_along_z(local, -gt_boxes[:, 6])
    lw = gt_boxes[:, None, [4, 3]] / 2  # (G, 1, 2): (dy, dx)/2
    in_gt = jnp.all((local[..., 0:2] <= lw) & (local[..., 0:2] >= -lw), axis=-1)
    is_pos = is_pos & in_gt & gt_valid[:, None]

    # scatter (gt, k) selections into a dense (A, G) validity mask
    sel = jnp.zeros((a, g), bool)
    sel = sel.at[topk_idxs, jnp.arange(g)[:, None]].max(is_pos)

    neg_inf = jnp.float32(-3.4e38)
    ious_inf = jnp.where(sel, ious, neg_inf)
    a2g_val = ious_inf.max(axis=1)
    a2g_idx = ious_inf.argmax(axis=1).astype(jnp.int32)

    # force-match: each valid gt claims its best-IoU anchor
    g2a_idx = ious.argmax(axis=0)  # (G,)
    force_val = ious.max(axis=0)
    a2g_idx = a2g_idx.at[g2a_idx].set(
        jnp.where(gt_valid, jnp.arange(g, dtype=jnp.int32), a2g_idx[g2a_idx]))
    a2g_val = a2g_val.at[g2a_idx].set(
        jnp.where(gt_valid, force_val, a2g_val[g2a_idx]))

    labels = jnp.where(a2g_val > neg_inf, gt_classes[a2g_idx], 0).astype(jnp.int32)
    matched = gt_boxes[a2g_idx]
    pos = labels > 0
    reg = box_coder.encode(matched, anchors)
    reg_targets = jnp.where(pos[:, None], reg, 0.0)
    return labels, reg_targets, pos.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('box_coder', 'topk', 'match_height'))
def atss_assign_targets(flat_anchors, gt_boxes, box_coder, topk=9,
                        match_height=False):
    """Batched ATSS assignment; same output contract as `assign_targets`."""
    gt = gt_boxes[..., :-1]
    gt_cls = gt_boxes[..., -1].astype(jnp.int32)
    labels, reg_targets, reg_weights = jax.vmap(
        lambda gb, c: _atss_assign_single(flat_anchors, gb, c, box_coder,
                                          topk, match_height)
    )(gt, gt_cls)
    return {
        'box_cls_labels': labels,
        'box_reg_targets': reg_targets,
        'reg_weights': reg_weights,
    }
