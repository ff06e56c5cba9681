"""Part-A² aggregation head (pcdet/models/roi_heads/partA2_head.py:10-225).

RoI-aware pooling of (part offsets + seg score) and UNet point features into
POOL_SIZE^3 grids per RoI, two sparse-conv branches, merge, shared FC,
cls/reg. The reference runs spconv over the pooled grids; on TPU the grids
are small and dense, and submanifold convolution == dense convolution with
the input zeroed at inactive cells and the output masked back to the active
set — exactly what `_masked_dense_conv3d` does, riding the MXU.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.box_coders import build_box_coder
from ...ops.roi_pool import roi_point_sample, roiaware_pool3d
from ..layers import MaskedBatchNorm
from . import roi_head_utils
from .pointrcnn_head import FCHead


class MaskedDenseSubMConv3d(nn.Module):
    """SubMConv3d over a dense (B, X, Y, Z, C) grid with an activity mask."""

    features: int
    kernel_size: int = 3
    use_relu: bool = True
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, active, training):
        # zero inactive inputs, convolve, mask outputs to active sites
        x = x * active[..., None].astype(x.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k, k), padding=[(1, 1)] * 3,
                    use_bias=False, dtype=self.dtype)(x)
        x = MaskedBatchNorm(use_running_average=not training,
                            axis_name=self.axis_name)(x, mask=active)
        if self.use_relu:
            x = nn.relu(x)
        return x * active[..., None].astype(x.dtype)


class PartA2FCHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1
    dtype: object = None
    axis_name: str | None = None

    def setup(self):
        tc = self.model_cfg['TARGET_CONFIG']
        self.box_coder = build_box_coder(tc['BOX_CODER'],
                                         **tc.get('BOX_CODER_CONFIG', {}))

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        nms_cfg = cfg['NMS_CONFIG']['TRAIN' if training else 'TEST']
        out = dict(batch)
        out.update(roi_head_utils.proposal_layer(batch, nms_cfg))

        fwd = {}
        if training:
            rng = self.make_rng('proposal')
            targets = roi_head_utils.assign_roi_targets(
                rng, out, cfg['TARGET_CONFIG'])
            out['rois'] = targets['rois']
            out['roi_labels'] = targets['roi_labels']
            out['roi_valid'] = jnp.ones(targets['rois'].shape[:2], bool)
            fwd.update(targets)

        rois = out['rois']
        b, r = rois.shape[:2]
        pool_cfg = cfg['ROI_AWARE_POOL']
        ps = int(pool_cfg['POOL_SIZE'])

        # --- part features: (part offsets, seg score), thresholded (:118-126);
        # DISABLE_PART (PartA2-free) uses raw point coords instead (:121)
        coords = batch['point_coords']  # (B, N, 3)
        scores = jax.lax.stop_gradient(out['point_cls_scores'])  # (B, N)
        part = coords if cfg.get('DISABLE_PART', False) \
            else out['point_part_offset']  # (B, N, 3)
        keep = scores >= cfg['SEG_MASK_SCORE_THRESH']
        part = part * keep[..., None]
        part_features = jnp.concatenate([part, scores[..., None]], axis=-1)
        num = batch.get('point_valid',
                        jnp.ones(coords.shape[:2], bool)).sum(1).astype(jnp.int32)

        # one in-box sampling pass shared by both pools (same rois/points);
        # see ops/roi_pool.roiaware_pool3d for the gather-then-scatter shape
        sample = roi_point_sample(coords, num, rois[..., :7],
                                  out['roi_valid'],
                                  cap=int(cfg.get('ROI_POINT_CAP', 1024)))
        pooled_part = roiaware_pool3d(
            coords, part_features, num, rois[..., :7], out['roi_valid'],
            out_size=(ps, ps, ps), pool_method='avg',
            sample=sample)  # (B, R, X, Y, Z, 4)
        pooled_rpn = roiaware_pool3d(
            coords, batch['point_features'], num, rois[..., :7],
            out['roi_valid'], out_size=(ps, ps, ps), pool_method='max',
            sample=sample)

        pooled_part = pooled_part.reshape(b * r, ps, ps, ps, -1)
        pooled_rpn = pooled_rpn.reshape(b * r, ps, ps, ps, -1)
        active = jnp.abs(pooled_part).sum(-1) > 0  # (B*R, X, Y, Z)

        c0 = int(pool_cfg['NUM_FEATURES']) // 2
        x_part = MaskedDenseSubMConv3d(64, dtype=self.dtype,
                                       axis_name=self.axis_name)(
            pooled_part, active, training)
        x_part = MaskedDenseSubMConv3d(c0, dtype=self.dtype,
                                       axis_name=self.axis_name)(
            x_part, active, training)
        x_rpn = MaskedDenseSubMConv3d(64, dtype=self.dtype,
                                      axis_name=self.axis_name)(
            pooled_rpn, active, training)
        x_rpn = MaskedDenseSubMConv3d(c0, dtype=self.dtype,
                                      axis_name=self.axis_name)(
            x_rpn, active, training)

        merged = jnp.concatenate([x_rpn, x_part], axis=-1)  # (B*R, X,Y,Z, C)
        # torch flattens dense (C, X, Y, Z): channel-major
        merged = jnp.moveaxis(merged, -1, 1).reshape(b * r, -1)

        x = merged
        for i, c in enumerate(cfg['SHARED_FC']):
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=False, dtype=self.dtype)(x)
            x = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(x)
            x = nn.relu(x)
            if i != len(cfg['SHARED_FC']) - 1 and cfg.get('DP_RATIO', 0) > 0:
                x = nn.Dropout(cfg['DP_RATIO'], deterministic=not training)(x)
        shared = x

        rcnn_cls = FCHead(tuple(cfg['CLS_FC']), self.num_class,
                          dtype=self.dtype, axis_name=self.axis_name)(
            shared, training)
        rcnn_reg = FCHead(tuple(cfg['REG_FC']),
                          self.box_coder.code_size * self.num_class,
                          dtype=self.dtype, axis_name=self.axis_name,
                          final_init_std=0.001)(shared, training)

        if not training:
            cls_b, box_b = roi_head_utils.generate_rcnn_boxes(
                rois, rcnn_cls, rcnn_reg, self.box_coder)
            out['batch_cls_preds'] = cls_b
            out['batch_box_preds'] = box_b
            out['batch_valid_preds'] = out['roi_valid']
            out['cls_preds_normalized'] = False
        else:
            fwd['rcnn_cls'] = rcnn_cls
            fwd['rcnn_reg'] = rcnn_reg
        out['roi_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        loss_cfg = self.model_cfg['LOSS_CONFIG']
        cls_loss, tb_cls = roi_head_utils.roi_cls_loss(fwd, loss_cfg)
        reg_loss, tb_reg = roi_head_utils.roi_box_loss(fwd, self.box_coder,
                                                       loss_cfg)
        total = cls_loss + reg_loss
        return total, {**tb_cls, **tb_reg, 'rcnn_loss': total}
