"""Multi-head anchor head for NuScenes CBGS
(pcdet/models/dense_heads/anchor_head_multi.py:9-373).

Shared conv + per-group SingleHead (optional mini BEV backbone, optional
separate per-box-term regression convs). Multihead anchor layout: per class
(S, R, nz, ny, nx) flattened, classes concatenated (matching the reference's
anchor.permute(3, 4, 0, 1, 2, 5).view(-1, D), anchor_head_template.py:177).

Divergence note: with SEPARATE_MULTIHEAD the reference remaps positive labels
to head-LOCAL ids (axis_aligned_target_assigner.py:29-34,70-74) but then
slices the GLOBAL one-hot by cumulative class offset
(anchor_head_multi.py:283-289), which misaligns positives for every head
after the first. We keep GLOBAL class ids end-to-end (equivalent to the
intended behavior since class_names order matches the flattened head order in
every shipped config), so the one-hot slice is consistent.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses
from ...core.geometry import limit_period
from ..backbones_2d.bev_backbone import BaseBEVBackbone
from ..layers import ConvBNReLU
from . import target_assigner
from .anchor_generator import generate_anchors
from .anchor_head import add_sin_difference, get_direction_target
from ...core.box_coders import build_box_coder


def flatten_anchors_multihead(anchors_list):
    """Per-class (nz, ny, nx, S, R, D) -> (S*R*nz*ny*nx, D), classes
    concatenated along axis 0 (anchor_head_template.py:177-179)."""
    flats, class_ids = [], []
    for i, a in enumerate(anchors_list):
        f = np.transpose(a, (3, 4, 0, 1, 2, 5)).reshape(-1, a.shape[-1])
        flats.append(f)
        class_ids.append(np.full(f.shape[0], i, np.int32))
    return np.concatenate(flats, 0), np.concatenate(class_ids, 0)


def build_multihead_anchors(model_cfg, grid_size, point_cloud_range):
    agc = model_cfg['ANCHOR_GENERATOR_CONFIG']
    coder_cfg = model_cfg['TARGET_ASSIGNER_CONFIG'].get('BOX_CODER_CONFIG', {})
    box_coder = build_box_coder(
        model_cfg['TARGET_ASSIGNER_CONFIG']['BOX_CODER'], **coder_cfg)
    anchors_list, num_per_loc = generate_anchors(
        agc, grid_size, point_cloud_range,
        anchor_ndim=box_coder.full_code_size)
    flat, anchor_class = flatten_anchors_multihead(anchors_list)
    matched = np.array([c['matched_threshold'] for c in agc], np.float32)[anchor_class]
    unmatched = np.array([c['unmatched_threshold'] for c in agc], np.float32)[anchor_class]
    return {
        'flat_anchors': flat, 'anchor_class': anchor_class,
        'matched_t': matched, 'unmatched_t': unmatched,
        'num_anchors_per_location': num_per_loc, 'box_coder': box_coder,
    }


class SingleHead(nn.Module):
    """One head group (anchor_head_multi.py:9-149), NHWC/channels-last."""

    model_cfg: dict
    rpn_head_cfg: dict
    num_class: int  # classes this head predicts
    num_anchors_per_location: int
    code_size: int
    separate_reg_config: dict | None = None
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training):
        cfg = self.model_cfg
        # optional mini BEV backbone per head (empty cfg = passthrough)
        if self.rpn_head_cfg.get('LAYER_NUMS'):
            x = BaseBEVBackbone(
                model_cfg=self.rpn_head_cfg, input_channels=x.shape[-1],
                axis_name=self.axis_name, dtype=self.dtype,
            )({'spatial_features': x}, training=training)['spatial_features_2d']

        na, nc = self.num_anchors_per_location, self.num_class
        pi = 0.01
        b, h, w, _ = x.shape

        def middle_stack(x):
            sep = self.separate_reg_config
            for _ in range(int(sep['NUM_MIDDLE_CONV'])):
                x = ConvBNReLU(int(sep['NUM_MIDDLE_FILTER']), 3, 1, padding=1,
                               use_running_average=not training,
                               axis_name=self.axis_name, dtype=self.dtype)(x)
            return x

        if self.separate_reg_config is not None:
            xc = middle_stack(x)
            cls_preds = nn.Conv(
                na * nc, (3, 3), padding=1, dtype=self.dtype,
                bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)))(xc)
            box_list = []
            for reg_config in self.separate_reg_config['REG_LIST']:
                reg_name, reg_channel = reg_config.split(':')
                xr = middle_stack(x)
                box_list.append(nn.Conv(
                    na * int(reg_channel), (3, 3), padding=1,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, 'fan_out', 'truncated_normal'))(xr))
            # (B, H, W, na*ci) per term -> (B, na, H, W, ci) -> concat ci
            parts = [p.reshape(b, h, w, na, -1) for p in box_list]
            box_preds = jnp.concatenate(parts, axis=-1)  # (B, H, W, na, code)
            box_preds = jnp.moveaxis(box_preds, 3, 1)  # (B, na, H, W, code)
        else:
            cls_preds = nn.Conv(
                na * nc, (1, 1), dtype=self.dtype,
                bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)))(x)
            box_preds = nn.Conv(na * self.code_size, (1, 1), dtype=self.dtype)(x)
            box_preds = jnp.moveaxis(
                box_preds.reshape(b, h, w, na, self.code_size), 3, 1)

        # multihead order: (anchor, H, W) per location-group
        cls_preds = jnp.moveaxis(
            cls_preds.reshape(b, h, w, na, nc), 3, 1
        ).reshape(b, -1, nc).astype(jnp.float32)
        box_preds = box_preds.reshape(b, -1, self.code_size).astype(jnp.float32)

        dir_preds = None
        if self.model_cfg.get('USE_DIRECTION_CLASSIFIER', None) is not None:
            nb = int(cfg['NUM_DIR_BINS'])
            dp = nn.Conv(na * nb, (1, 1), dtype=self.dtype)(x)
            dir_preds = jnp.moveaxis(
                dp.reshape(b, h, w, na, nb), 3, 1
            ).reshape(b, -1, nb).astype(jnp.float32)
        return cls_preds, box_preds, dir_preds


class AnchorHeadMulti(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    predict_boxes_when_training: bool = False
    dtype: object = None
    axis_name: str | None = None

    def setup(self):
        info = build_multihead_anchors(
            self.model_cfg, self.grid_size, self.point_cloud_range)
        self._anchor_info = info
        self.box_coder = info['box_coder']
        self.separate_multihead = self.model_cfg.get('SEPARATE_MULTIHEAD', False)

        cfg = self.model_cfg
        if cfg.get('SHARED_CONV_NUM_FILTER'):
            self.shared_conv = ConvBNReLU(
                int(cfg['SHARED_CONV_NUM_FILTER']), 3, 1, padding=1,
                axis_name=self.axis_name, dtype=self.dtype)
        else:
            self.shared_conv = None

        head_cfgs = cfg['RPN_HEAD_CFGS']
        all_head_classes = []
        for hc in head_cfgs:
            all_head_classes.extend(hc['HEAD_CLS_NAME'])
        heads, label_indices, num_classes = [], [], []
        for hc in head_cfgs:
            na = sum(info['num_anchors_per_location'][all_head_classes.index(n)]
                     for n in hc['HEAD_CLS_NAME'])
            nc = len(hc['HEAD_CLS_NAME']) if self.separate_multihead \
                else self.num_class
            heads.append(SingleHead(
                model_cfg=cfg, rpn_head_cfg=hc, num_class=nc,
                num_anchors_per_location=na,
                code_size=self.box_coder.full_code_size,
                separate_reg_config=cfg.get('SEPARATE_REG_CONFIG'),
                dtype=self.dtype, axis_name=self.axis_name))
            label_indices.append(tuple(
                self.class_names.index(n) + 1 for n in hc['HEAD_CLS_NAME']))
            num_classes.append(nc)
        self.rpn_heads = heads
        self.head_label_indices = tuple(label_indices)
        self.head_num_classes = tuple(num_classes)

    def __call__(self, batch, training=False):
        x = batch['spatial_features_2d']
        if self.shared_conv is not None:
            x = self.shared_conv(x, use_running_average=not training)

        cls_list, box_list, dir_list = [], [], []
        for head in self.rpn_heads:
            c, bx, d = head(x, training)
            cls_list.append(c)
            box_list.append(bx)
            if d is not None:
                dir_list.append(d)

        out = dict(batch)
        info = self._anchor_info
        anchors = jnp.asarray(info['flat_anchors'])
        fwd = {'cls_preds': cls_list, 'box_preds': box_list,
               'dir_cls_preds': dir_list or None}
        if training:
            fwd.update(target_assigner.assign_targets(
                anchors, jnp.asarray(info['anchor_class']),
                jnp.asarray(info['matched_t']), jnp.asarray(info['unmatched_t']),
                batch['gt_boxes'], box_coder=self.box_coder,
                match_height=self.model_cfg['TARGET_ASSIGNER_CONFIG'].get(
                    'MATCH_HEIGHT', False)))

        if not training or self.predict_boxes_when_training:
            box_all = jnp.concatenate(box_list, axis=1)
            decoded = self.box_coder.decode(box_all, anchors[None])
            if dir_list:
                dir_all = jnp.concatenate(dir_list, axis=1)
                dir_offset = self.model_cfg.get('DIR_OFFSET', 0.78539)
                dir_limit_offset = self.model_cfg.get('DIR_LIMIT_OFFSET', 0.0)
                nb = self.model_cfg['NUM_DIR_BINS']
                dir_labels = jnp.argmax(dir_all, axis=-1)
                period = 2 * np.pi / nb
                dir_rot = limit_period(
                    decoded[..., 6] - dir_offset, dir_limit_offset, period)
                decoded = decoded.at[..., 6].set(
                    dir_rot + dir_offset + period * dir_labels)
            if self.separate_multihead:
                out['batch_cls_preds'] = cls_list  # list per head
                out['multihead_label_mapping'] = tuple(self.head_label_indices)
            else:
                out['batch_cls_preds'] = jnp.concatenate(cls_list, axis=1)
            out['batch_box_preds'] = decoded
            out['cls_preds_normalized'] = False
        out['anchor_head_fwd'] = fwd
        return out

    def get_anchor_constants(self):
        return self._anchor_info

    def loss(self, fwd):
        """Multi-head RPN loss (anchor_head_multi.py:246-373)."""
        cfg = self.model_cfg
        w = cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        pos_w = w.get('pos_cls_weight', 1.0)
        neg_w = w.get('neg_cls_weight', 1.0)
        reg_loss_name = cfg['LOSS_CONFIG'].get('REG_LOSS_TYPE',
                                               'WeightedSmoothL1Loss')
        labels = fwd['box_cls_labels']  # (B, A) global class ids
        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives * neg_w + positives * pos_w).astype(jnp.float32)
        reg_weights = positives.astype(jnp.float32)
        pos_norm = jnp.clip(positives.sum(1, keepdims=True).astype(jnp.float32),
                            1.0, None)
        cls_weights = cls_weights / pos_norm
        reg_weights = reg_weights / pos_norm
        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1,
                                 dtype=jnp.float32)[..., 1:]

        total_cls = jnp.float32(0.0)
        start = c_idx = 0
        b = fwd['cls_preds'][0].shape[0]
        for idx, cls_pred in enumerate(fwd['cls_preds']):
            nc = self.head_num_classes[idx]
            a_head = cls_pred.shape[1]
            if self.separate_multihead:
                oh = one_hot[:, start:start + a_head, c_idx:c_idx + nc]
                c_idx += nc
            else:
                oh = one_hot[:, start:start + a_head]
            cw = cls_weights[:, start:start + a_head]
            loss = losses.sigmoid_focal_loss(cls_pred, oh, cw).sum() / b
            total_cls = total_cls + loss * w['cls_weight']
            start += a_head

        anchors = jnp.asarray(self._anchor_info['flat_anchors'])
        reg_targets = fwd['box_reg_targets']
        total_box = jnp.float32(0.0)
        tb = {}
        start = 0
        use_dir = fwd.get('dir_cls_preds') is not None
        if use_dir:
            dir_targets = get_direction_target(
                anchors, reg_targets, dir_offset=cfg.get('DIR_OFFSET', 0.78539),
                num_bins=cfg['NUM_DIR_BINS'])
        for idx, box_pred in enumerate(fwd['box_preds']):
            a_head = box_pred.shape[1]
            rt = reg_targets[:, start:start + a_head]
            rw = reg_weights[:, start:start + a_head]
            if use_dir:
                bp, rt_sin = add_sin_difference(box_pred, rt)
            else:
                bp, rt_sin = box_pred, rt
            if reg_loss_name == 'WeightedL1Loss':
                loc = losses.weighted_l1_loss(
                    bp, rt_sin, rw, code_weights=w['code_weights']).sum() / b
            else:
                loc = losses.weighted_smooth_l1_loss(
                    bp, rt_sin, rw, code_weights=w['code_weights']).sum() / b
            total_box = total_box + loc * w['loc_weight']
            if use_dir:
                dir_logit = fwd['dir_cls_preds'][idx]
                weights = positives.astype(jnp.float32)
                weights = weights / jnp.clip(weights.sum(-1, keepdims=True),
                                             1.0, None)
                dl = losses.weighted_cross_entropy_loss(
                    dir_logit, dir_targets[:, start:start + a_head],
                    weights[:, start:start + a_head]).sum() / b
                total_box = total_box + dl * w['dir_weight']
            start += a_head

        rpn_loss = total_cls + total_box
        tb.update({'rpn_loss_cls': total_cls, 'rpn_loss_loc': total_box,
                   'rpn_loss': rpn_loss})
        return rpn_loss, tb
