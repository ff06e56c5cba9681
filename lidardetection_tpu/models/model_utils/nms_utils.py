"""Class-agnostic and multi-class NMS wrappers with fixed-size outputs.

Mirrors pcdet/models/model_utils/model_nms_utils.py:6-66. Dynamic
score-threshold filtering becomes a validity mask; outputs are padded to
NMS_POST_MAXSIZE with an explicit count — the jit-able contract used by all
post-processing and proposal layers here.
"""

import jax.numpy as jnp

from ...core import iou3d


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None,
                       valid_mask=None):
    """One sample. box_scores (N,), box_preds (N, 7+).

    Returns (selected_idx (post,), selected_mask (post,), num) — indices into
    the input arrays (model_nms_utils.py:6-29).
    """
    if valid_mask is None:
        valid_mask = jnp.ones(box_scores.shape, dtype=bool)
    if score_thresh is not None:
        valid_mask = valid_mask & (box_scores >= score_thresh)
    nms_fn = iou3d.nms_bev if nms_config['NMS_TYPE'] == 'nms_gpu' else iou3d.nms_normal_bev
    return nms_fn(
        box_preds[:, 0:7], box_scores,
        thresh=nms_config['NMS_THRESH'],
        pre_maxsize=int(nms_config['NMS_PRE_MAXSIZE']),
        post_maxsize=int(nms_config['NMS_POST_MAXSIZE']),
        valid_mask=valid_mask,
    )


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None,
                      valid_mask=None):
    """Per-class NMS over (N, num_class) scores (model_nms_utils.py:32-66).

    Returns fixed-size (num_class * post,) arrays:
        scores, labels (0-based class idx), boxes (…, 7+), keep_mask.
    """
    n, num_class = cls_scores.shape
    post = int(nms_config['NMS_POST_MAXSIZE'])
    all_scores, all_labels, all_boxes, all_mask = [], [], [], []
    for k in range(num_class):
        idx, mask, _ = class_agnostic_nms(
            cls_scores[:, k], box_preds, nms_config, score_thresh, valid_mask)
        all_scores.append(jnp.where(mask, cls_scores[idx, k], 0.0))
        all_labels.append(jnp.full((post,), k, dtype=jnp.int32))
        all_boxes.append(box_preds[idx] * mask[:, None])
        all_mask.append(mask)
    return (jnp.concatenate(all_scores), jnp.concatenate(all_labels),
            jnp.concatenate(all_boxes), jnp.concatenate(all_mask))
