"""Detector post-processing: NMS + recall bookkeeping, fixed-size.

Re-expresses Detector3DTemplate.post_processing
(detector3d_template.py:169-276) and generate_recall_record (:278-319) as
pure vmapped functions. The per-sample python loop of the reference becomes a
vmap; the dynamic `selected` index list becomes (post_max,) padded indices +
mask + count.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ...core.iou3d import boxes_iou3d
from ..model_utils import nms_utils


def _safe_top_k(x, k):
    """top_k over the last axis of a (B, N) operand.

    top_k on a (1, N) f32 operand crashes the XLA:TPU compiler (fusion_util
    TransformWindow check failure, observed on v5e); the squeezed 1-D form
    compiles fine, so batch-1 operands are routed through it.
    """
    if x.ndim == 2 and x.shape[0] == 1:
        vals, idx = jax.lax.top_k(x[0], k)
        return vals[None], idx[None]
    return jax.lax.top_k(x, k)


def post_processing(batch, post_cfg, num_class):
    """Args:
        batch: dict with batch_box_preds (B, N, 7+C), batch_cls_preds
            (B, N, nc) (+ optional 'batch_pred_labels'/'roi_labels' (B, N)),
            cls_preds_normalized: bool.
    Returns:
        dict with pred_boxes (B, post, 7+C), pred_scores (B, post),
        pred_labels (B, post) int32 (1-based), pred_mask (B, post) bool,
        num_preds (B,).
    """
    nms_cfg = post_cfg['NMS_CONFIG']
    if nms_cfg.get('MULTI_CLASSES_NMS', False):
        # handles per-head cls lists; applies its own sigmoid
        return _multi_class_post_processing(batch, post_cfg, num_class)

    score_thresh = post_cfg.get('SCORE_THRESH', None)
    normalized = batch.get('cls_preds_normalized', False)

    if 'roi_labels' in batch:
        label_src = batch['roi_labels']
    elif 'batch_pred_labels' in batch:
        label_src = batch['batch_pred_labels']
    else:
        label_src = None

    from ...core.iou3d import nms_bev_batched, nms_normal_bev

    if 'decode_box_fn' in batch:
        # Deferred decode (single-stage eval): rank candidates on the RAW
        # logits (sigmoid is monotonic) in the head's compute dtype, select
        # the top NMS_PRE_MAXSIZE rows, and only then upcast + sigmoid +
        # decode those rows. Selection is two-level and BEV-layout-native:
        # a lane-reduce computes each PIXEL's best logit over all its
        # anchors*classes (one streaming pass over the (B, H, W, na*tot)
        # head output), an approx top-k picks the best pixels, and only
        # those pixels' full rows are gathered and exactly re-ranked. A
        # per-anchor repack of the whole grid would shuffle every lane and
        # pad tot=18 lanes to 128 — ~7x the HBM traffic of this pass.
        fused = batch['batch_fused_preds']  # (B, H, W, na*tot)
        nc, code, nd = batch['head_raw_sizes']
        h, w, na = batch['head_layout']
        tot = nc + code + nd
        bsz, hw = fused.shape[0], h * w
        flat = fused.reshape(bsz, hw, na * tot)  # layout-preserving (w%8==0)
        valid = batch.get('batch_valid_preds')

        lane_is_cls = np.zeros((na * tot,), bool)
        for a in range(na):
            lane_is_cls[a * tot:a * tot + nc] = True
        neg = jnp.asarray(-jnp.inf, fused.dtype)
        pix_rank = jnp.max(
            jnp.where(jnp.asarray(lane_is_cls), flat, neg),
            axis=-1).astype(jnp.float32)  # (B, hw)

        pre = min(int(nms_cfg['NMS_PRE_MAXSIZE']), hw * na)
        if nms_cfg.get('EXACT_TOPK', False):
            # Selecting the top `pre` PIXELS (ranked by their best anchor)
            # and re-ranking all their anchors is provably exact: if anchor
            # a's pixel is outside the top-pre pixels, then >= pre pixels
            # each hold an anchor outscoring a, so a cannot be in the true
            # top-pre anchor set. Costs a wider gather (pre*na rows).
            n_pix = min(((pre + 127) // 128) * 128, hw)
        else:
            n_pix = -(-pre // na)
            n_pix = min(((n_pix + 127) // 128) * 128, hw)
        if n_pix >= hw:
            pix_i = jnp.broadcast_to(
                jnp.arange(hw, dtype=jnp.int32)[None], (bsz, hw))
        elif pix_rank.shape[0] == 1 or nms_cfg.get('EXACT_TOPK', False):
            _, pix_i = _safe_top_k(pix_rank, n_pix)
        else:
            # TPU-native approximate top-k; recall 0.99 over pixels far
            # beyond what survives NMS — AP-neutral. Set
            # NMS_CONFIG.EXACT_TOPK for exact top-NMS_PRE_MAXSIZE selection.
            _, pix_i = jax.lax.approx_max_k(
                pix_rank, n_pix, recall_target=0.99)
        rows_pix = jnp.take_along_axis(flat, pix_i[..., None], axis=1)
        cand = rows_pix.reshape(bsz, -1, tot)  # (B, n_pix*na, tot)
        cand_i = (pix_i[:, :, None] * na
                  + jnp.arange(na, dtype=jnp.int32)[None, None, :]
                  ).reshape(bsz, -1)  # global anchor ids, head row order

        cand_rank = cand[..., :nc].max(axis=-1).astype(jnp.float32)
        cand_valid = jnp.ones_like(cand_rank, bool)
        if valid is not None:
            cand_valid &= jnp.take_along_axis(valid, cand_i, axis=1)
        if score_thresh is not None:
            thr = float(score_thresh) if normalized else \
                float(np.log(score_thresh / (1.0 - score_thresh)))
            cand_valid &= cand_rank >= thr
        masked = jnp.where(cand_valid, cand_rank, -jnp.inf)
        # exact final ranking over the (small) candidate pool
        top_s, sel = _safe_top_k(masked, min(pre, masked.shape[1]))
        rows = jnp.take_along_axis(cand, sel[..., None], axis=1)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)

        cls_rows = rows[..., :nc].astype(jnp.float32)
        probs = cls_rows if normalized else jax.nn.sigmoid(cls_rows)
        scores = probs.max(axis=-1)
        if label_src is not None:
            labels = jnp.take_along_axis(
                label_src.astype(jnp.int32), top_i, axis=1)
        else:
            labels = probs.argmax(axis=-1).astype(jnp.int32) + 1
        dir_rows = rows[..., nc + code:] if nd else None
        anchor_rows = batch['anchor_from_idx'](top_i)
        box_preds = batch['decode_box_fn'](
            rows[..., nc:nc + code], dir_rows, anchor_rows)
        valid = jnp.isfinite(top_s)
        scores = jnp.where(valid, scores, 0.0)
    else:
        cls_raw = batch['batch_cls_preds']
        valid = batch.get('batch_valid_preds')
        if valid is None:
            valid = jnp.ones(cls_raw.shape[:2], dtype=bool)
        box_preds = batch['batch_box_preds']
        cls_preds = cls_raw if normalized else jax.nn.sigmoid(cls_raw)
        scores = cls_preds.max(axis=-1)  # (B, N)
        arg = cls_preds.argmax(axis=-1).astype(jnp.int32)
        labels = label_src.astype(jnp.int32) if label_src is not None \
            else arg + 1
        if score_thresh is not None:
            valid = valid & (scores >= score_thresh)

    post = int(nms_cfg['NMS_POST_MAXSIZE'])
    if nms_cfg['NMS_TYPE'] == 'nms_gpu':
        idx, mask, num = nms_bev_batched(
            box_preds[..., 0:7], scores,
            thresh=nms_cfg['NMS_THRESH'],
            pre_maxsize=int(nms_cfg['NMS_PRE_MAXSIZE']),
            post_maxsize=post, valid_mask=valid,
            # deferred-decode candidates come straight out of a top-k, so
            # they already descend by score — skip the in-NMS re-sort
            assume_sorted='decode_box_fn' in batch)
    else:
        idx, mask, num = jax.vmap(
            lambda b, s, v: nms_normal_bev(
                b, s, nms_cfg['NMS_THRESH'],
                int(nms_cfg['NMS_PRE_MAXSIZE']), post, v)
        )(box_preds[..., 0:7], scores, valid)

    sel_boxes = jnp.take_along_axis(box_preds, idx[..., None], axis=1) \
        * mask[..., None]
    sel_scores = jnp.where(mask, jnp.take_along_axis(scores, idx, axis=1), 0.0)
    sel_labels = jnp.where(mask, jnp.take_along_axis(labels, idx, axis=1), 0)
    return {
        'pred_boxes': sel_boxes, 'pred_scores': sel_scores,
        'pred_labels': sel_labels, 'pred_mask': mask, 'num_preds': num,
    }


def compute_recall(pred_boxes, pred_mask, gt_boxes, thresh_list, rois=None,
                   roi_mask=None):
    """Recall counters vs gt (generate_recall_record, detector3d_template.py:278).

    Args:
        pred_boxes (B, N, 7+), pred_mask (B, N) bool,
        gt_boxes (B, G, 8) class-in-last-col (0 pad).
    Returns:
        dict: 'gt' scalar count plus 'rcnn_<t>' (and 'roi_<t>') counters.
    """
    gt_valid = gt_boxes[..., -1] > 0  # (B, G)

    def one(preds, pmask, gts, gmask):
        iou = boxes_iou3d(preds[:, :7], gts[:, :7])  # (N, G)
        iou = jnp.where(pmask[:, None] & gmask[None, :], iou, 0.0)
        best = iou.max(axis=0)  # (G,)
        return best

    best = jax.vmap(one)(pred_boxes, pred_mask, gt_boxes[..., :-1], gt_valid)
    out = {'gt': gt_valid.sum()}
    for t in thresh_list:
        out[f'rcnn_{t}'] = ((best > t) & gt_valid).sum()
    if rois is not None:
        best_roi = jax.vmap(one)(rois, roi_mask, gt_boxes[..., :-1], gt_valid)
        for t in thresh_list:
            out[f'roi_{t}'] = ((best_roi > t) & gt_valid).sum()
    return out


def _multi_class_post_processing(batch, post_cfg, num_class):
    """Per-class NMS path (detector3d_template.py:222-247): used by the
    NuScenes multi-head models. cls preds may be a per-head list with
    `multihead_label_mapping` giving each head's global class ids."""
    nms_cfg = post_cfg['NMS_CONFIG']
    score_thresh = post_cfg.get('SCORE_THRESH', None)
    box_preds = batch['batch_box_preds']
    cls_preds = batch['batch_cls_preds']
    if not isinstance(cls_preds, (list, tuple)):
        cls_preds = [cls_preds]
        label_mapping = [tuple(range(1, num_class + 1))]
    else:
        label_mapping = batch['multihead_label_mapping']

    from ..model_utils.nms_utils import multi_classes_nms

    all_scores, all_labels, all_boxes, all_mask = [], [], [], []
    start = 0
    for head_cls, mapping in zip(cls_preds, label_mapping):
        n = head_cls.shape[1]
        head_boxes = box_preds[:, start:start + n]
        probs = jax.nn.sigmoid(head_cls) \
            if not batch.get('cls_preds_normalized', False) else head_cls
        out = jax.lax.map(
            lambda t: multi_classes_nms(t[0], t[1], nms_cfg, score_thresh),
            (probs, head_boxes))
        scores, labels, boxes, mask = out
        global_labels = jnp.asarray(mapping, jnp.int32)[labels]
        all_scores.append(scores)
        all_labels.append(jnp.where(mask, global_labels, 0))
        all_boxes.append(boxes)
        all_mask.append(mask)
        start += n

    return {
        'pred_boxes': jnp.concatenate(all_boxes, axis=1),
        'pred_scores': jnp.concatenate(all_scores, axis=1),
        'pred_labels': jnp.concatenate(all_labels, axis=1),
        'pred_mask': jnp.concatenate(all_mask, axis=1),
        'num_preds': jnp.concatenate(all_mask, axis=1).sum(axis=1).astype(jnp.int32),
    }
