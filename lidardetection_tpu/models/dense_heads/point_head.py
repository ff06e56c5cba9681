"""Point heads (PV-RCNN keypoint seg, PointRCNN cls+box, Part-A2 part offsets).

Re-expresses pcdet/models/dense_heads/point_head_{template,simple,box,
intra_part_head}.py. The reference's per-sample python loop in
assign_stack_targets (point_head_template.py:49-131) is a vmapped masked
pass; flat (N1+N2+..., C) point lists become (B, N, C) padded batches, with
padding points labeled -1 (ignored) so they carry zero loss weight.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses
from ...core.box_coders import build_box_coder
from ...core.geometry import enlarge_box3d, points_in_boxes_id, rotate_points_along_z
from ..layers import MaskedBatchNorm


def assign_point_targets(point_coords, point_valid, gt_boxes, box_coder=None,
                         extra_width=None, ret_box_labels=False,
                         ret_part_labels=False, set_ignore_flag=True,
                         use_ball_constraint=False, central_radius=2.0,
                         num_class=3):
    """Vmapped twin of assign_stack_targets (point_head_template.py:49-131).

    Args:
        point_coords: (B, N, 3); point_valid: (B, N) bool;
        gt_boxes: (B, M, 8) class-in-last-col.
    Returns dict with point_cls_labels (B, N) int32 (-1 ignored / 0 bg /
    class), optional point_box_labels (B, N, code), point_part_labels (B, N, 3).
    """

    def one(pts, valid, gts):
        gt_valid = gts[:, -1] > 0
        box_id = points_in_boxes_id(pts, gts[:, :7], gt_valid)  # (N,)
        fg = box_id >= 0
        matched = gts[jnp.clip(box_id, 0, None)]  # (N, 8)
        if set_ignore_flag:
            ext = enlarge_box3d(gts[:, :7], extra_width)
            ext_id = points_in_boxes_id(pts, ext, gt_valid)
            ignore = fg ^ (ext_id >= 0)
        elif use_ball_constraint:
            centers = matched[:, 0:3].at[:, 2].add(matched[:, 5] / 2)
            ball = jnp.linalg.norm(centers - pts, axis=1) < central_radius
            fg = fg & ball
            ignore = jnp.zeros_like(fg)
        else:
            raise NotImplementedError
        cls_of_point = matched[:, -1].astype(jnp.int32) if num_class > 1 else \
            jnp.ones(pts.shape[0], jnp.int32)
        labels = jnp.where(fg, cls_of_point, jnp.where(ignore, -1, 0))
        labels = jnp.where(valid, labels, -1)  # padding points ignored
        out = {'point_cls_labels': labels}
        if ret_box_labels:
            enc = box_coder.encode(matched[:, :7], pts,
                                   matched[:, -1].astype(jnp.int32))
            out['point_box_labels'] = jnp.where(fg[:, None], enc, 0.0)
        if ret_part_labels:
            local = pts - matched[:, 0:3]
            local = rotate_points_along_z(local[:, None, :], -matched[:, 6])[:, 0]
            part = local / matched[:, 3:6] + 0.5
            out['point_part_labels'] = jnp.where(fg[:, None], part, 0.0)
        return out

    return jax.vmap(one)(point_coords, point_valid, gt_boxes)


def point_cls_loss(point_cls_preds, point_cls_labels, num_class, weight=1.0):
    """Focal seg loss over all points (point_head_template.py:134-156)."""
    labels = point_cls_labels.reshape(-1)
    preds = point_cls_preds.reshape(-1, num_class)
    positives = labels > 0
    cls_weights = ((labels == 0) + positives).astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum().astype(jnp.float32), 1.0, None)
    cls_weights = cls_weights / pos_normalizer
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1,
                             dtype=preds.dtype)[..., 1:]
    loss = losses.sigmoid_focal_loss(preds[None], one_hot[None],
                                     cls_weights[None]).sum()
    return loss * weight, pos_normalizer


def point_box_loss(point_box_preds, point_box_labels, point_cls_labels,
                   code_weights=None, weight=1.0):
    """Smooth-L1 box loss over fg points (point_head_template.py:173-193)."""
    labels = point_cls_labels.reshape(-1)
    preds = point_box_preds.reshape(-1, point_box_preds.shape[-1])
    targets = point_box_labels.reshape(-1, preds.shape[-1])
    pos = (labels > 0).astype(jnp.float32)
    reg_weights = pos / jnp.clip(pos.sum(), 1.0, None)
    loss = losses.weighted_smooth_l1_loss(
        preds[None], targets[None], reg_weights[None],
        code_weights=code_weights).sum()
    return loss * weight


def point_part_loss(point_part_preds, point_part_labels, point_cls_labels,
                    weight=1.0):
    """BCE part-offset loss over fg points (point_head_template.py:158-171)."""
    labels = point_cls_labels.reshape(-1)
    preds = point_part_preds.reshape(-1, 3)
    targets = point_part_labels.reshape(-1, 3)
    pos = labels > 0
    pos_normalizer = jnp.clip(pos.sum().astype(jnp.float32), 1.0, None)
    p = jax.nn.sigmoid(preds)
    bce = -(targets * jnp.log(jnp.clip(p, 1e-7, None))
            + (1 - targets) * jnp.log(jnp.clip(1 - p, 1e-7, None)))
    loss = (bce.sum(-1) * pos).sum() / (3 * pos_normalizer)
    return loss * weight


class FCLayers(nn.Module):
    """Linear(+BN)+ReLU stack with a final plain Linear
    (point_head_template.py:36-47)."""

    fc_cfg: tuple
    output_channels: int
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, valid_mask, training):
        for c in self.fc_cfg:
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=False, dtype=self.dtype)(x)
            x = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(
                x, mask=jnp.broadcast_to(valid_mask, x.shape[:-1]))
            x = nn.relu(x)
        return nn.Dense(self.output_channels)(
            x.astype(jnp.float32)).astype(jnp.float32)


class PointHeadSimple(nn.Module):
    """Foreground-score head for PV-RCNN keypoints (point_head_simple.py:7)."""

    model_cfg: dict
    num_class: int
    input_channels: int
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, batch, training=False):
        feats = batch['point_features_before_fusion'] \
            if self.model_cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False) \
            else batch['point_features']
        valid = batch['point_valid']  # (B, N)
        preds = FCLayers(tuple(self.model_cfg['CLS_FC']), self.num_class,
                         dtype=self.dtype, axis_name=self.axis_name)(
            feats, valid, training)
        out = dict(batch)
        out['point_cls_scores'] = jax.nn.sigmoid(preds).max(-1)
        fwd = {'point_cls_preds': preds}
        if training:
            fwd.update(assign_point_targets(
                batch['point_coords'], valid, batch['gt_boxes'],
                extra_width=tuple(self.model_cfg['TARGET_CONFIG']['GT_EXTRA_WIDTH']),
                set_ignore_flag=True, num_class=self.num_class))
        out['point_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        w = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        loss, pos = point_cls_loss(fwd['point_cls_preds'],
                                   fwd['point_cls_labels'], self.num_class,
                                   w['point_cls_weight'])
        return loss, {'point_loss_cls': loss, 'point_pos_num': pos}


class PointHeadBox(nn.Module):
    """PointRCNN first-stage point head (point_head_box.py:7-117)."""

    model_cfg: dict
    num_class: int
    input_channels: int
    predict_boxes_when_training: bool = True
    dtype: object = None
    axis_name: str | None = None

    def setup(self):
        tc = self.model_cfg['TARGET_CONFIG']
        self.box_coder = build_box_coder(tc['BOX_CODER'],
                                         **tc.get('BOX_CODER_CONFIG', {}))
        self.cls_layers = FCLayers(tuple(self.model_cfg['CLS_FC']),
                                   self.num_class, dtype=self.dtype,
                                   axis_name=self.axis_name)
        self.box_layers = FCLayers(tuple(self.model_cfg['REG_FC']),
                                   self.box_coder.full_code_size,
                                   dtype=self.dtype, axis_name=self.axis_name)

    def __call__(self, batch, training=False):
        feats = batch['point_features']
        valid = batch['point_valid']
        cls_preds = self.cls_layers(feats, valid, training)
        box_preds = self.box_layers(feats, valid, training)
        out = dict(batch)
        out['point_cls_scores'] = jax.nn.sigmoid(cls_preds).max(-1)
        fwd = {'point_cls_preds': cls_preds, 'point_box_preds': box_preds}
        if training:
            fwd.update(assign_point_targets(
                batch['point_coords'], valid, batch['gt_boxes'],
                box_coder=self.box_coder,
                extra_width=tuple(self.model_cfg['TARGET_CONFIG']['GT_EXTRA_WIDTH']),
                ret_box_labels=True, set_ignore_flag=True,
                num_class=self.num_class))
        if not training or self.predict_boxes_when_training:
            pred_classes = cls_preds.argmax(-1) + 1
            decoded = self.box_coder.decode(box_preds, batch['point_coords'],
                                            pred_classes)
            out['batch_cls_preds'] = cls_preds  # (B, N, nc)
            out['batch_box_preds'] = decoded  # (B, N, 7)
            out['batch_valid_preds'] = valid
            out['cls_preds_normalized'] = False
        out['point_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        w = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        cls_loss, pos = point_cls_loss(fwd['point_cls_preds'],
                                       fwd['point_cls_labels'],
                                       self.num_class, w['point_cls_weight'])
        box_loss = point_box_loss(fwd['point_box_preds'],
                                  fwd['point_box_labels'],
                                  fwd['point_cls_labels'],
                                  code_weights=w.get('code_weights'),
                                  weight=w['point_box_weight'])
        total = cls_loss + box_loss
        return total, {'point_loss_cls': cls_loss, 'point_loss_box': box_loss,
                       'point_pos_num': pos}


class PointIntraPartOffsetHead(nn.Module):
    """Part-A2 point head: fg seg + intra-object part offsets (+ optional
    box) (point_intra_part_head.py:7-122)."""

    model_cfg: dict
    num_class: int
    input_channels: int
    predict_boxes_when_training: bool = False
    dtype: object = None
    axis_name: str | None = None

    def setup(self):
        tc = self.model_cfg['TARGET_CONFIG']
        self.box_coder = build_box_coder(
            tc['BOX_CODER'], **tc.get('BOX_CODER_CONFIG', {})) \
            if tc.get('BOX_CODER') else None
        self.cls_layers = FCLayers(tuple(self.model_cfg['CLS_FC']),
                                   self.num_class, dtype=self.dtype,
                                   axis_name=self.axis_name)
        self.part_reg_layers = FCLayers(tuple(self.model_cfg['PART_FC']), 3,
                                        dtype=self.dtype,
                                        axis_name=self.axis_name)
        if self.box_coder is not None:
            self.box_layers = FCLayers(tuple(self.model_cfg['REG_FC']),
                                       self.box_coder.full_code_size,
                                       dtype=self.dtype,
                                       axis_name=self.axis_name)
        else:
            self.box_layers = None

    def __call__(self, batch, training=False):
        feats = batch['point_features']
        valid = batch['point_valid']
        cls_preds = self.cls_layers(feats, valid, training)
        part_preds = self.part_reg_layers(feats, valid, training)
        out = dict(batch)
        out['point_cls_scores'] = jax.nn.sigmoid(cls_preds).max(-1)
        out['point_part_offset'] = jax.nn.sigmoid(part_preds)
        fwd = {'point_cls_preds': cls_preds, 'point_part_preds': part_preds}
        box_preds = None
        if self.box_layers is not None:
            box_preds = self.box_layers(feats, valid, training)
            fwd['point_box_preds'] = box_preds
        if training:
            fwd.update(assign_point_targets(
                batch['point_coords'], valid, batch['gt_boxes'],
                box_coder=self.box_coder,
                extra_width=tuple(self.model_cfg['TARGET_CONFIG']['GT_EXTRA_WIDTH']),
                ret_box_labels=self.box_layers is not None,
                ret_part_labels=True, set_ignore_flag=True,
                num_class=self.num_class))
        if self.box_layers is not None and (
                not training or self.predict_boxes_when_training):
            pred_classes = cls_preds.argmax(-1) + 1
            decoded = self.box_coder.decode(box_preds, batch['point_coords'],
                                            pred_classes)
            out['batch_cls_preds'] = cls_preds
            out['batch_box_preds'] = decoded
            out['batch_valid_preds'] = valid
            out['cls_preds_normalized'] = False
        out['point_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        w = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        cls_loss, pos = point_cls_loss(fwd['point_cls_preds'],
                                       fwd['point_cls_labels'],
                                       self.num_class, w['point_cls_weight'])
        part_loss = point_part_loss(fwd['point_part_preds'],
                                    fwd['point_part_labels'],
                                    fwd['point_cls_labels'],
                                    w['point_part_weight'])
        total = cls_loss + part_loss
        tb = {'point_loss_cls': cls_loss, 'point_loss_part': part_loss,
              'point_pos_num': pos}
        if 'point_box_preds' in fwd and 'point_box_labels' in fwd:
            box_loss = point_box_loss(
                fwd['point_box_preds'], fwd['point_box_labels'],
                fwd['point_cls_labels'], code_weights=w.get('code_weights'),
                weight=w.get('point_box_weight', 1.0))
            total = total + box_loss
            tb['point_loss_box'] = box_loss
        return total, tb


class PointHeadSimpleMultiFrame(nn.Module):
    """Multiframe keypoint seg head (point_head_simple_multiframe.py:7-133):
    one fg score per stacked frame, each supervised by the gt boxes moved to
    that frame's pose (locations/rotations_y side arrays)."""

    model_cfg: dict
    num_class: int
    input_channels: int
    stack_frame_size: int
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, batch, training=False):
        feats = batch['point_features_before_fusion'] \
            if self.model_cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False) \
            else batch['point_features']
        valid = batch['point_valid']
        t = self.stack_frame_size
        preds = FCLayers(tuple(self.model_cfg['CLS_FC']),
                         self.num_class * t, dtype=self.dtype,
                         axis_name=self.axis_name)(feats, valid, training)
        out = dict(batch)
        out['point_cls_scores'] = jax.nn.sigmoid(preds).max(-1)
        fwd = {'point_cls_preds': preds}
        if training:
            labels = []
            gt = batch['gt_boxes']
            for i in range(t):
                gt_i = gt.at[..., 0:3].set(batch['locations'][:, :, i, :])
                gt_i = gt_i.at[..., 6].set(batch['rotations_y'][:, :, i])
                tgt = assign_point_targets(
                    batch['point_coords'], valid, gt_i,
                    extra_width=tuple(
                        self.model_cfg['TARGET_CONFIG']['GT_EXTRA_WIDTH']),
                    set_ignore_flag=True, num_class=self.num_class)
                labels.append(tgt['point_cls_labels'])
            fwd['point_cls_labels_list'] = tuple(labels)
        out['point_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        """Per-frame focal seg loss with a shared normalizer
        (point_head_simple_multiframe.py:60-92)."""
        w = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        labels_list = fwd['point_cls_labels_list']
        preds = fwd['point_cls_preds'].reshape(
            -1, self.num_class * self.stack_frame_size)
        stacked = jnp.stack([l.reshape(-1) for l in labels_list], axis=-1)
        positives = stacked > 0
        cls_weights = ((stacked == 0) + positives).astype(jnp.float32)
        pos_norm = jnp.clip(positives.sum().astype(jnp.float32), 1.0, None)
        cls_weights = (cls_weights / pos_norm).sum(axis=-1)
        one_hots = [
            jax.nn.one_hot(jnp.clip(l.reshape(-1), 0, None),
                           self.num_class + 1, dtype=preds.dtype)[..., 1:]
            for l in labels_list
        ]
        one_hot = jnp.concatenate(one_hots, axis=-1)
        loss = losses.sigmoid_focal_loss(
            preds[None], one_hot[None], cls_weights[None]).sum()
        loss = loss * w['point_cls_weight']
        return loss, {'point_loss_cls': loss, 'point_pos_num': pos_norm}
