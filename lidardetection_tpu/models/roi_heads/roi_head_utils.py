"""Two-stage RoI machinery: proposal layer, RoI target sampling, losses.

Re-expresses pcdet/models/roi_heads/roi_head_template.py:46-263 and
target_assigner/proposal_target_layer.py:13-238 with static shapes:
  * the proposal layer's per-sample NMS python loop (:72-96) -> batched
    lazy NMS with padded (B, NMS_POST, ...) outputs;
  * the dynamic fg/easy-bg/hard-bg subsampling (:131-204) -> rank-based
    masked selection with on-device RNG: random scores per category, top-k
    compaction, per-slot category routing. Sampling with replacement for bg
    (the reference uses randint) and a random permutation for fg.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses
from ...core.geometry import rotate_points_along_z
from ...core.iou3d import boxes_iou3d, nms_bev_batched


def proposal_layer(batch, nms_cfg):
    """(roi_head_template.py:46-103). Returns rois (B, P, 7+C), roi_scores
    (B, P), roi_labels (B, P) 1-based, roi_valid (B, P)."""
    box_preds = batch['batch_box_preds']
    cls_preds = batch['batch_cls_preds']
    scores = cls_preds.max(axis=-1)
    labels = cls_preds.argmax(axis=-1).astype(jnp.int32)
    valid = batch.get('batch_valid_preds', None)

    idx, mask, num = nms_bev_batched(
        box_preds[..., 0:7], scores,
        thresh=nms_cfg['NMS_THRESH'],
        pre_maxsize=int(nms_cfg['NMS_PRE_MAXSIZE']),
        post_maxsize=int(nms_cfg['NMS_POST_MAXSIZE']),
        valid_mask=valid)
    rois = jnp.take_along_axis(box_preds, idx[..., None], axis=1)
    rois = rois * mask[..., None]
    roi_scores = jnp.where(mask, jnp.take_along_axis(scores, idx, axis=1), 0.0)
    roi_labels = jnp.where(mask, jnp.take_along_axis(labels, idx, axis=1) + 1, 0)
    return {
        'rois': rois, 'roi_scores': roi_scores, 'roi_labels': roi_labels,
        'roi_valid': mask,
        'has_class_labels': cls_preds.shape[-1] > 1,
    }


def _masked_choice_with_replacement(rng, member_mask, n_pick_max):
    """Pick n_pick_max indices uniformly (w/ replacement) from mask's True set.

    Returns (picks (n_pick_max,) int32 into the original array, count = |set|).
    Mirrors the torch.randint draws of sample_bg_inds
    (proposal_target_layer.py:175-204).
    """
    n = member_mask.shape[0]
    cnt = member_mask.sum().astype(jnp.int32)
    # compact member indices to the front (stable)
    order = jnp.argsort(~member_mask, stable=True)  # members first
    u = jax.random.uniform(rng, (n_pick_max,))
    pick_pos = jnp.floor(u * jnp.maximum(cnt, 1)).astype(jnp.int32)
    return order[pick_pos].astype(jnp.int32), cnt


def _masked_permutation(rng, member_mask):
    """Random permutation of the True set compacted to the front."""
    scores = jax.random.uniform(rng, member_mask.shape)
    scores = jnp.where(member_mask, scores, 2.0)  # non-members last
    order = jnp.argsort(scores)
    return order.astype(jnp.int32), member_mask.sum().astype(jnp.int32)


def subsample_rois(rng, max_overlaps, roi_valid, sampler_cfg):
    """Fixed-size fg/easy-bg/hard-bg RoI sampling
    (proposal_target_layer.py:131-173).

    Returns sampled_inds (ROI_PER_IMAGE,) int32.
    """
    roi_per_image = int(sampler_cfg['ROI_PER_IMAGE'])
    fg_ratio = float(sampler_cfg['FG_RATIO'])
    fg_thresh = min(sampler_cfg['REG_FG_THRESH'], sampler_cfg['CLS_FG_THRESH'])
    bg_lo = float(sampler_cfg['CLS_BG_THRESH_LO'])
    reg_fg = float(sampler_cfg['REG_FG_THRESH'])
    hard_ratio = float(sampler_cfg['HARD_BG_RATIO'])
    fg_per_image = int(np.round(fg_ratio * roi_per_image))

    ov = jnp.where(roi_valid, max_overlaps, -1.0)
    fg_mask = ov >= fg_thresh
    easy_mask = roi_valid & (ov < bg_lo)
    hard_mask = roi_valid & (ov >= bg_lo) & (ov < reg_fg)

    r_fg, r_fgr, r_hard, r_easy = jax.random.split(rng, 4)
    fg_perm, n_fg = _masked_permutation(r_fg, fg_mask)
    fg_rep, _ = _masked_choice_with_replacement(r_fgr, fg_mask, roi_per_image)
    hard_pick, n_hard = _masked_choice_with_replacement(r_hard, hard_mask,
                                                        roi_per_image)
    easy_pick, n_easy = _masked_choice_with_replacement(r_easy, easy_mask,
                                                        roi_per_image)
    n_bg = n_hard + n_easy

    # case both fg and bg exist
    n_fg_used = jnp.minimum(fg_per_image, n_fg)
    n_bg_used = roi_per_image - n_fg_used
    n_hard_used = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((n_bg_used.astype(jnp.float32) * hard_ratio).astype(jnp.int32),
                    n_hard),
        jnp.where(n_hard > 0, n_bg_used, 0))

    slot = jnp.arange(roi_per_image)
    # routing within the "both exist" case
    is_fg_slot = slot < n_fg_used
    is_hard_slot = (~is_fg_slot) & (slot < n_fg_used + n_hard_used)
    both = jnp.where(
        is_fg_slot, fg_perm[jnp.minimum(slot, fg_perm.shape[0] - 1)],
        jnp.where(is_hard_slot, hard_pick[slot], easy_pick[slot]))
    only_fg = fg_rep[slot]
    # bg-only: reuse hard/easy routing with n_fg_used = 0
    n_hard_only = jnp.where((n_hard > 0) & (n_easy > 0),
                            jnp.minimum(int(np.round(roi_per_image * hard_ratio)),
                                        n_hard),
                            jnp.where(n_hard > 0, roi_per_image, 0))
    only_bg = jnp.where(slot < n_hard_only, hard_pick[slot], easy_pick[slot])

    out = jnp.where((n_fg > 0) & (n_bg > 0), both,
                    jnp.where(n_fg > 0, only_fg, only_bg))
    return out.astype(jnp.int32)


def get_max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels, gt_valid):
    """Class-aware max-IoU matching (proposal_target_layer.py:206-238),
    vectorized: IoU masked by label equality."""
    iou = boxes_iou3d(rois[:, 0:7], gt_boxes[:, 0:7])  # (R, G)
    compat = (roi_labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]
    iou = jnp.where(compat, iou, 0.0)
    return iou.max(axis=1), iou.argmax(axis=1).astype(jnp.int32)


def sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, roi_valid,
                         gt_boxes, sampler_cfg, gt_boxes_enlarged=None,
                         gt_tracking=None):
    """(proposal_target_layer.py:64-129), batched via vmap.

    gt_boxes_enlarged (if given) drives the IoU matching while gt_of_rois
    come from the original boxes; gt_tracking (B, G, 8) is appended to
    gt_of_rois (REG_TRACKING_INFO, :118-124).
    Returns dict of (B, ROI_PER_IMAGE, ...) tensors.
    """

    def one(key, roi, scores, labels, valid, gts, gts_match, track):
        gt_labels = gts[:, -1].astype(jnp.int32)
        gt_valid = gt_labels > 0
        if sampler_cfg.get('SAMPLE_ROI_BY_EACH_CLASS', False):
            max_ov, gt_assign = get_max_iou_with_same_class(
                roi, labels, gts_match, gt_labels, gt_valid)
        else:
            iou = boxes_iou3d(roi[:, 0:7], gts_match[:, 0:7])
            iou = jnp.where(gt_valid[None, :], iou, 0.0)
            max_ov, gt_assign = iou.max(axis=1), iou.argmax(axis=1).astype(jnp.int32)

        sampled = subsample_rois(key, max_ov, valid, sampler_cfg)
        gt_full = gts if track is None else jnp.concatenate([gts, track], axis=-1)
        return {
            'rois': roi[sampled],
            'gt_of_rois': gt_full[gt_assign[sampled]],
            'gt_iou_of_rois': max_ov[sampled],
            'roi_scores': scores[sampled],
            'roi_labels': labels[sampled],
        }

    keys = jax.random.split(rng, rois.shape[0])
    match = gt_boxes if gt_boxes_enlarged is None else gt_boxes_enlarged
    if gt_tracking is None:
        return jax.vmap(lambda k, r, s, l, v, g, m: one(k, r, s, l, v, g, m, None)
                        )(keys, rois, roi_scores, roi_labels, roi_valid,
                          gt_boxes, match)
    return jax.vmap(one)(keys, rois, roi_scores, roi_labels, roi_valid,
                         gt_boxes, match, gt_tracking)


def assign_roi_targets(rng, batch, sampler_cfg):
    """ProposalTargetLayer.forward + canonical transform
    (proposal_target_layer.py:13-62, roi_head_template.py:101-137)."""
    gt_tracking = None
    if sampler_cfg.get('REG_TRACKING_INFO', False):
        # per-gt tracking targets: frame-to-frame displacement + first two
        # frame headings (proposal_target_layer.py:118-124)
        loc = batch['locations']  # (B, G, T, 3)
        roty = batch['rotations_y']  # (B, G, T)
        gt_tracking = jnp.concatenate(
            [loc[:, :, 1, :] - loc[:, :, 0, :],
             loc[:, :, 2, :] - loc[:, :, 1, :],
             roty[:, :, 0:2]], axis=-1)  # (B, G, 8)
    t = sample_rois_for_rcnn(rng, batch['rois'], batch['roi_scores'],
                             batch['roi_labels'], batch['roi_valid'],
                             batch['gt_boxes'], sampler_cfg,
                             gt_boxes_enlarged=batch.get('gt_boxes_enlarged'),
                             gt_tracking=gt_tracking)
    ious = t['gt_iou_of_rois']
    t['reg_valid_mask'] = (ious > sampler_cfg['REG_FG_THRESH']).astype(jnp.int32)
    if sampler_cfg['CLS_SCORE_TYPE'] == 'cls':
        labels = (ious > sampler_cfg['CLS_FG_THRESH']).astype(jnp.float32)
        ignore = (ious > sampler_cfg['CLS_BG_THRESH']) & \
                 (ious < sampler_cfg['CLS_FG_THRESH'])
        t['rcnn_cls_labels'] = jnp.where(ignore, -1.0, labels)
    elif sampler_cfg['CLS_SCORE_TYPE'] == 'roi_iou':
        lo, hi = sampler_cfg['CLS_BG_THRESH'], sampler_cfg['CLS_FG_THRESH']
        soft = jnp.clip((ious - lo) / (hi - lo), 0.0, 1.0)
        t['rcnn_cls_labels'] = soft
    else:
        raise NotImplementedError

    # canonical transform of gt into roi frame + heading flip to (-pi/2, pi/2)
    rois = t['rois']
    gt = t['gt_of_rois']
    t['gt_of_rois_src'] = gt
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * np.pi)
    local = gt.at[..., 0:3].add(-roi_center)
    b, r = local.shape[:2]
    local = rotate_points_along_z(
        local.reshape(b * r, 1, -1), -roi_ry.reshape(-1)).reshape(gt.shape)
    # the heading must also be canonicalized into the roi frame
    # (roi_head_template.py:118 `gt_of_rois[:, :, 6] -= roi_ry`):
    # rotate_points_along_z only transforms xyz, so without this
    # subtraction the target heading is the RAW gt heading while decode
    # reconstructs `pred + roi_ry` — the reg loss then fights the
    # flip-invariant corner loss and refinement converges with ~0.5 rad
    # heading noise (measured round 5: cyclist refine IoU 0.66 -> 0.44
    # on BOTH train and eval rois; fixed by this line)
    heading = (local[..., 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    local = local.at[..., 6].set(heading)
    t['gt_of_rois'] = local
    return t


def roi_box_loss(fwd, box_coder, loss_cfg):
    """RCNN reg (+corner) loss (roi_head_template.py:139-203)."""
    code_size = box_coder.code_size
    reg_valid = fwd['reg_valid_mask'].reshape(-1).astype(jnp.float32)
    gt_ct = fwd['gt_of_rois'][..., 0:code_size].reshape(-1, code_size)
    gt_src = fwd['gt_of_rois_src'][..., 0:code_size].reshape(-1, code_size)
    rcnn_reg = fwd['rcnn_reg'].reshape(-1, fwd['rcnn_reg'].shape[-1])
    rois = fwd['rois'].reshape(-1, fwd['rois'].shape[-1])
    fg_sum = jnp.clip(reg_valid.sum(), 1.0, None)
    w = loss_cfg['LOSS_WEIGHTS']

    assert loss_cfg['REG_LOSS'] == 'smooth-l1'
    rois_anchor = rois[:, 0:code_size]
    rois_anchor = rois_anchor.at[:, 0:3].set(0).at[:, 6].set(0)
    reg_targets = box_coder.encode(gt_ct, rois_anchor)
    if fwd.get('reg_tracking_info', False):
        # gt_of_rois layout: box (code) + class (1) + tracking (8)
        track = fwd['gt_of_rois'][..., code_size + 1:]
        reg_targets = jnp.concatenate(
            [reg_targets, track.reshape(reg_targets.shape[0], -1)], axis=-1)
    loss_reg = losses.weighted_smooth_l1_loss(
        rcnn_reg[None, :, 0:reg_targets.shape[-1]], reg_targets[None],
        code_weights=w['code_weights'])
    loss_reg = (loss_reg[0].sum(-1) * reg_valid).sum() / fg_sum
    loss_reg = loss_reg * w['rcnn_reg_weight']
    tb = {'rcnn_loss_reg': loss_reg}

    if loss_cfg.get('CORNER_LOSS_REGULARIZATION', False):
        anchors = rois[:, 0:code_size].at[:, 0:3].set(0)
        decoded = box_coder.decode(rcnn_reg[:, 0:code_size], anchors)
        decoded = rotate_points_along_z(
            decoded[:, None, :], rois[:, 6])[:, 0]
        decoded = decoded.at[:, 0:3].add(rois[:, 0:3])
        corner = losses.corner_loss_lidar(decoded[:, 0:7], gt_src[:, 0:7])
        loss_corner = (corner * reg_valid).sum() / fg_sum
        loss_corner = loss_corner * w['rcnn_corner_weight']
        loss_reg = loss_reg + loss_corner
        tb['rcnn_loss_corner'] = loss_corner
    return loss_reg, tb


def roi_cls_loss(fwd, loss_cfg):
    """RCNN cls loss (roi_head_template.py:204-223)."""
    rcnn_cls = fwd['rcnn_cls']
    labels = fwd['rcnn_cls_labels'].reshape(-1)
    w = loss_cfg['LOSS_WEIGHTS']
    if loss_cfg['CLS_LOSS'] == 'BinaryCrossEntropy':
        flat = rcnn_cls.reshape(-1)
        p = jax.nn.sigmoid(flat)
        bce = -(labels * jnp.log(jnp.clip(p, 1e-7, None))
                + (1 - labels) * jnp.log(jnp.clip(1 - p, 1e-7, None)))
        valid = (labels >= 0).astype(jnp.float32)
        loss = (bce * valid).sum() / jnp.clip(valid.sum(), 1.0, None)
    elif loss_cfg['CLS_LOSS'] == 'CrossEntropy':
        logits = rcnn_cls.reshape(-1, rcnn_cls.shape[-1])
        valid = (labels >= 0).astype(jnp.float32)
        lbl = jnp.clip(labels, 0, None).astype(jnp.int32)
        ce = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), lbl]
        loss = (ce * valid).sum() / jnp.clip(valid.sum(), 1.0, None)
    else:
        raise NotImplementedError
    loss = loss * w['rcnn_cls_weight']
    return loss, {'rcnn_loss_cls': loss}


def generate_rcnn_boxes(rois, cls_preds, box_preds, box_coder):
    """Decode rcnn outputs back to world boxes
    (roi_head_template.py:238-263)."""
    b, r = rois.shape[:2]
    code_size = box_coder.code_size
    local_rois = rois[..., 0:code_size].at[..., 0:3].set(0)
    decoded = box_coder.decode(box_preds.reshape(b, r, -1)[..., 0:code_size],
                               local_rois)
    decoded = rotate_points_along_z(
        decoded.reshape(b * r, 1, -1), rois[..., 6].reshape(-1)
    ).reshape(b, r, -1)
    decoded = decoded.at[..., 0:3].add(rois[..., 0:3])
    return cls_preds.reshape(b, r, -1), decoded
