"""Anchor-based dense heads.

AnchorHeadSingle (anchor_head_single.py:8-110) + the loss/decode machinery of
AnchorHeadTemplate (anchor_head_template.py:11-273), re-expressed as a flax
module plus pure loss functions. Anchors are host-precomputed numpy constants
baked into the jitted graph.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses
from ...core.box_coders import build_box_coder
from ...core.geometry import limit_period
from . import target_assigner
from .anchor_generator import flatten_anchors, generate_anchors


def build_head_anchors(model_cfg, grid_size, point_cloud_range, num_class_names):
    """Precompute flat anchors + per-anchor class/threshold arrays."""
    agc = model_cfg['ANCHOR_GENERATOR_CONFIG']
    box_coder_cfg = model_cfg['TARGET_ASSIGNER_CONFIG'].get('BOX_CODER_CONFIG', {})
    box_coder = build_box_coder(
        model_cfg['TARGET_ASSIGNER_CONFIG']['BOX_CODER'], **box_coder_cfg)
    # anchors padded to the coder's full code size, as the reference does
    # (anchor_head_template.py:47-51 with box_coder.code_size)
    anchors_list, num_per_loc = generate_anchors(
        agc, grid_size, point_cloud_range, anchor_ndim=box_coder.full_code_size)
    flat, anchor_class = flatten_anchors(anchors_list)
    matched_t = np.array([c['matched_threshold'] for c in agc], np.float32)[anchor_class]
    unmatched_t = np.array([c['unmatched_threshold'] for c in agc], np.float32)[anchor_class]
    return {
        'flat_anchors': flat,
        'anchor_class': anchor_class,
        'matched_t': matched_t,
        'unmatched_t': unmatched_t,
        'num_anchors_per_location': sum(num_per_loc),
        'box_coder': box_coder,
        'feature_map_size': anchors_list[0].shape[:3],  # (nz, ny, nx)
    }


class AnchorHeadSingle(nn.Module):
    """1x1 conv heads over the BEV map + target assignment + box decode."""

    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    predict_boxes_when_training: bool = False
    dtype: object = None

    def setup(self):
        info = build_head_anchors(
            self.model_cfg, self.grid_size, self.point_cloud_range,
            len(self.class_names))
        self._anchor_info = info
        self.box_coder = info['box_coder']
        na = info['num_anchors_per_location']
        code = self.box_coder.full_code_size
        # focal-style bias init pi=0.01, box weights std=0.001
        # (anchor_head_single.py:38-41). The three 1x1 heads are separate
        # parameters but applied as ONE fused matmul: three narrow (<=128-
        # lane) f32 outputs force costly padded layouts on TPU (measured
        # 37ms vs 2.3ms fused-bf16 per batch at KITTI eval shapes).
        pi = 0.01
        self.use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', False)
        c_in = self.input_channels
        lecun = nn.initializers.lecun_normal()
        self.w_cls = self.param('conv_cls_kernel', lecun,
                                (c_in, na * self.num_class))
        self.b_cls = self.param(
            'conv_cls_bias',
            nn.initializers.constant(-np.log((1 - pi) / pi)),
            (na * self.num_class,))
        self.w_box = self.param('conv_box_kernel',
                                nn.initializers.normal(0.001),
                                (c_in, na * code))
        self.b_box = self.param('conv_box_bias', nn.initializers.zeros,
                                (na * code,))
        if self.use_dir:
            self.num_dir_bins = self.model_cfg['NUM_DIR_BINS']
            self.w_dir = self.param('conv_dir_kernel', lecun,
                                    (c_in, na * self.num_dir_bins))
            self.b_dir = self.param('conv_dir_bias', nn.initializers.zeros,
                                    (na * self.num_dir_bins,))
        assign_cfg = self.model_cfg['TARGET_ASSIGNER_CONFIG']
        assert assign_cfg.get('POS_FRACTION', -1) < 0, \
            'POS_FRACTION subsampling unused by shipped configs'

    def __call__(self, batch, training=False):
        x = batch['spatial_features_2d']  # (B, H, W, C)
        b = x.shape[0]
        cdt = self.dtype or x.dtype
        info = self._anchor_info
        na = info['num_anchors_per_location']
        nc = self.num_class
        code = self.box_coder.full_code_size
        nd = self.num_dir_bins if self.use_dir else 0
        tot = nc + code + nd
        # One fused matmul whose output channels are already interleaved
        # per-anchor ([a0: cls|box|dir][a1: ...]): the column shuffle of the
        # three weight matrices happens at compile time, so the packed
        # (B, N_anchors, tot) view post_processing gathers from is a free
        # reshape instead of a runtime transpose.
        ws, bs = [], []
        for a in range(na):
            ws += [self.w_cls[:, a * nc:(a + 1) * nc],
                   self.w_box[:, a * code:(a + 1) * code]]
            bs += [self.b_cls[a * nc:(a + 1) * nc],
                   self.b_box[a * code:(a + 1) * code]]
            if self.use_dir:
                ws.append(self.w_dir[:, a * nd:(a + 1) * nd])
                bs.append(self.b_dir[a * nd:(a + 1) * nd])
        fused = x.astype(cdt) @ jnp.concatenate(ws, 1).astype(cdt) \
            + jnp.concatenate(bs).astype(cdt)  # (B, H, W, na*tot)
        h, w = fused.shape[1], fused.shape[2]
        out = dict(batch)
        need_unpacked = training or self.predict_boxes_when_training
        if need_unpacked:
            # losses / two-stage decode need the de-interleaved per-term
            # views; the deferred-decode eval path never materializes them
            # (it gathers straight from `packed`), skipping ~60 MB of slice
            # copies per KITTI eval batch
            fused4 = fused.reshape(b, h, w, na, tot)
            cls_preds = fused4[..., :nc].reshape(b, h, w, na * nc)
            box_preds = fused4[..., nc:nc + code].reshape(b, h, w, na * code)
            dir_preds = fused4[..., nc + code:].reshape(b, h, w, na * nd) \
                if self.use_dir else None
            if training:
                # losses are precision-sensitive: full-resolution f32 there;
                # eval keeps raw preds in compute dtype and upcasts only the
                # top-k rows that post_processing decodes
                cls_preds = cls_preds.astype(jnp.float32)
                box_preds = box_preds.astype(jnp.float32)
                if dir_preds is not None:
                    dir_preds = dir_preds.astype(jnp.float32)
            fwd = {'cls_preds': cls_preds, 'box_preds': box_preds}
            if dir_preds is not None:
                fwd['dir_cls_preds'] = dir_preds
        else:
            fwd = {}

        info = self._anchor_info
        anchors = jnp.asarray(info['flat_anchors'])
        if training:
            ta_cfg = self.model_cfg['TARGET_ASSIGNER_CONFIG']
            gt_enlarged = None
            if self.model_cfg.get('USE_MULTIFRAME_ENLARGED_GT_BOXES', False):
                gt_enlarged = compute_multiframe_enlarged_gt(
                    batch['gt_boxes'], batch['locations'],
                    batch['rotations_y'])
                out['gt_boxes_enlarged'] = gt_enlarged
            if ta_cfg['NAME'] == 'ATSS':
                fwd.update(target_assigner.atss_assign_targets(
                    anchors, batch['gt_boxes'], box_coder=self.box_coder,
                    topk=int(ta_cfg.get('TOPK', 9)),
                    match_height=ta_cfg.get('MATCH_HEIGHT', False)))
            else:
                fwd.update(target_assigner.assign_targets(
                    anchors, jnp.asarray(info['anchor_class']),
                    jnp.asarray(info['matched_t']),
                    jnp.asarray(info['unmatched_t']),
                    batch['gt_boxes'], box_coder=self.box_coder,
                    match_height=ta_cfg.get('MATCH_HEIGHT', False),
                    gt_boxes_enlarged=gt_enlarged))

        if not training or self.predict_boxes_when_training:
            code = self.box_coder.full_code_size

            def decode_boxes(raw, dir_raw, anchor_rows):
                batch_box = self.box_coder.decode(
                    raw.astype(jnp.float32), anchor_rows)
                if self.use_dir:
                    dir_offset = self.model_cfg.get('DIR_OFFSET', 0.78539)
                    dir_limit = self.model_cfg.get('DIR_LIMIT_OFFSET', 0.0)
                    dir_labels = jnp.argmax(
                        dir_raw.astype(jnp.float32), axis=-1)
                    period = 2 * np.pi / self.num_dir_bins
                    dir_rot = limit_period(
                        batch_box[..., 6] - dir_offset, dir_limit, period)
                    heading = dir_rot + dir_offset + \
                        period * dir_labels.astype(batch_box.dtype)
                    batch_box = batch_box.at[..., 6].set(heading)
                return batch_box

            if not training and not self.predict_boxes_when_training:
                # Single-stage eval: defer the (B, N_anchors) box decode so
                # post_processing can decode only the top-k candidate rows
                # (exactly equal results — decode is per-row). Raw preds
                # stay in the BEV-native (B, H, W, na*tot) layout — a
                # (B, N, tot) repack would be a full-tensor lane shuffle
                # whose 18-lane minor dim pads to 128 on TPU (~7x the HBM
                # bytes). post_processing selects top pixels (lane-reduce
                # rank), gathers their na*tot rows, and reconstructs
                # anchors arithmetically (the dense grid is separable: xy
                # from the position index, the rest from an (na, code-2)
                # table) instead of gathering 7-wide f32 rows.
                nz, ny, nx = (int(v) for v in info['feature_map_size'])
                out['batch_fused_preds'] = fused
                out['head_raw_sizes'] = (nc, code, nd)
                out['head_layout'] = (h, w, na)

                fa = info['flat_anchors']  # numpy (N, code)
                ar = fa.reshape(nz * ny, nx, na, fa.shape[-1])
                xs, ys = ar[0, :, 0, 0], ar[:, 0, 0, 1]
                tab = ar[0, 0, :, 2:]
                recon = np.concatenate([
                    np.broadcast_to(xs[None, :, None, None],
                                    ar[..., :1].shape),
                    np.broadcast_to(ys[:, None, None, None],
                                    ar[..., 1:2].shape),
                    np.broadcast_to(tab[None, None], ar[..., 2:].shape),
                ], axis=-1)
                if np.allclose(recon, ar):
                    xs_j, ys_j, tab_j = (jnp.asarray(v)
                                         for v in (xs, ys, tab))

                    def anchor_from_idx(idx):
                        a = idx % na
                        pos = idx // na
                        ix = pos % nx
                        iy = pos // nx
                        return jnp.concatenate(
                            [xs_j[ix][..., None], ys_j[iy][..., None],
                             tab_j[a]], axis=-1)
                else:  # non-separable grid: plain row gather
                    def anchor_from_idx(idx):
                        return jnp.asarray(fa)[idx]

                out['anchor_from_idx'] = anchor_from_idx
                out['decode_box_fn'] = decode_boxes
            else:
                box_raw = box_preds.reshape(b, -1, code)
                dir_raw = dir_preds.reshape(b, -1, self.num_dir_bins) \
                    if self.use_dir else None
                out['batch_cls_preds'] = fused.reshape(
                    b, h * w * na, tot)[..., :nc].astype(jnp.float32)
                out['batch_box_preds'] = decode_boxes(
                    box_raw, dir_raw, anchors[None])
            out['cls_preds_normalized'] = False

        out['anchor_head_fwd'] = fwd
        return out

    def get_anchor_constants(self):
        return self._anchor_info

    def loss(self, fwd):
        return anchor_head_loss(
            fwd, jnp.asarray(self._anchor_info['flat_anchors']),
            self.num_class, self.model_cfg)


def compute_multiframe_enlarged_gt(gt_boxes, locations, rotations_y):
    """BEV extent of a box swept over its per-frame poses
    (anchor_head_single.py:63-97): corners at every frame pose, rotated into
    the current box frame; dx/dy become the swept min/max extents.

    Args:
        gt_boxes (B, G, 8+); locations (B, G, T, 3); rotations_y (B, G, T).
    Returns (B, G, 8+) with enlarged dx, dy.
    """
    from ...core.geometry import boxes_to_corners_3d, rotate_points_along_z

    b, g, t, _ = locations.shape
    d = gt_boxes.shape[-1]
    flat_gt = gt_boxes.reshape(b * g, d)
    corners = []
    for i in range(t):
        cur = flat_gt[:, :7]
        cur = cur.at[:, 0:3].set(locations.reshape(b * g, t, 3)[:, i])
        cur = cur.at[:, 6].set(rotations_y.reshape(b * g, t)[:, i])
        corners.append(boxes_to_corners_3d(cur))
    corners = jnp.concatenate(corners, axis=1)  # (BG, 8T, 3)
    corners = corners - flat_gt[:, None, 0:3]
    local = rotate_points_along_z(corners, -flat_gt[:, 6])
    multi_len = local[:, :, 0].max(axis=1) - local[:, :, 0].min(axis=1)
    multi_wid = local[:, :, 1].max(axis=1) - local[:, :, 1].min(axis=1)
    enlarged = flat_gt.at[:, 3].set(multi_len).at[:, 4].set(multi_wid)
    return enlarged.reshape(b, g, d)


def add_sin_difference(boxes1, boxes2, dim=6):
    """sin(a-b) factorization for heading regression (anchor_head_template.py:139-145)."""
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return b1, b2


def get_direction_target(flat_anchors, reg_targets, dir_offset, num_bins):
    """Direction-bin targets from gt heading (anchor_head_template.py:148-161)."""
    rot_gt = reg_targets[..., 6] + flat_anchors[None, :, 6]
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    bins = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1)
    return jax.nn.one_hot(bins, num_bins, dtype=reg_targets.dtype)


def anchor_head_loss(fwd, flat_anchors, num_class, model_cfg):
    """RPN cls + reg (+dir) loss (anchor_head_template.py:102-224).

    Args:
        fwd: dict with cls_preds (B,H,W,na*nc), box_preds, dir_cls_preds?,
            box_cls_labels (B,A), box_reg_targets (B,A,code), reg_weights.
    Returns:
        (scalar loss, tb_dict)
    """
    loss_cfg = model_cfg['LOSS_CONFIG']
    weights_cfg = loss_cfg['LOSS_WEIGHTS']
    cls_preds = fwd['cls_preds']
    box_preds = fwd['box_preds']
    labels = fwd['box_cls_labels']  # (B, A)
    b = cls_preds.shape[0]

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives + positives).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    reg_weights = reg_weights / pos_normalizer
    cls_weights = cls_weights / pos_normalizer

    cls_targets = jnp.where(cared, labels, 0)
    if num_class == 1:
        cls_targets = jnp.where(positives, 1, cls_targets)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1, dtype=cls_preds.dtype)[..., 1:]
    cls_preds_flat = cls_preds.reshape(b, -1, num_class)
    cls_loss = losses.sigmoid_focal_loss(cls_preds_flat, one_hot, cls_weights).sum() / b
    cls_loss = cls_loss * weights_cfg['cls_weight']

    code = fwd['box_reg_targets'].shape[-1]
    box_preds_flat = box_preds.reshape(b, -1, code)
    box_preds_sin, reg_targets_sin = add_sin_difference(
        box_preds_flat, fwd['box_reg_targets'])
    loc_loss = losses.weighted_smooth_l1_loss(
        box_preds_sin, reg_targets_sin, reg_weights,
        code_weights=weights_cfg['code_weights']).sum() / b
    loc_loss = loc_loss * weights_cfg['loc_weight']

    tb = {'rpn_loss_cls': cls_loss, 'rpn_loss_loc': loc_loss}
    box_loss = loc_loss
    if 'dir_cls_preds' in fwd:
        num_bins = model_cfg['NUM_DIR_BINS']
        dir_targets = get_direction_target(
            flat_anchors, fwd['box_reg_targets'],
            dir_offset=model_cfg.get('DIR_OFFSET', 0.78539), num_bins=num_bins)
        dir_logits = fwd['dir_cls_preds'].reshape(b, -1, num_bins)
        weights = positives.astype(jnp.float32)
        weights = weights / jnp.clip(weights.sum(-1, keepdims=True), 1.0, None)
        dir_loss = losses.weighted_cross_entropy_loss(
            dir_logits, dir_targets, weights).sum() / b
        dir_loss = dir_loss * weights_cfg['dir_weight']
        box_loss = box_loss + dir_loss
        tb['rpn_loss_dir'] = dir_loss

    rpn_loss = cls_loss + box_loss
    tb['rpn_loss'] = rpn_loss
    return rpn_loss, tb
