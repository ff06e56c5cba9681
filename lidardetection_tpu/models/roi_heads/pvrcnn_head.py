"""PV-RCNN second stage: RoI-grid pooling head
(pcdet/models/roi_heads/pvrcnn_head.py:8-185).

6^3 grid points per RoI -> stack-SA ball-query pooling of keypoint features
(weighted by keypoint fg scores) -> shared FC -> cls/reg.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.box_coders import build_box_coder
from ...core.geometry import rotate_points_along_z
from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG
from ..layers import MaskedBatchNorm
from . import roi_head_utils
from .pointrcnn_head import FCHead


def get_dense_grid_points(rois, grid_size):
    """(..., 7) -> (..., grid^3, 3) local grid points (pvrcnn_head.py:133-142)."""
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing='ij'), axis=-1).reshape(-1, 3)
    dense_idx = jnp.asarray(idx, jnp.float32)  # (g^3, 3) [x, y, z]
    local_size = rois[..., None, 3:6]
    return (dense_idx + 0.5) / g * local_size - local_size / 2


def get_global_grid_points_of_roi(rois, grid_size):
    """(B, R, 7) -> (B, R, g^3, 3) world-frame grid points (:121-131)."""
    b, r = rois.shape[:2]
    local = get_dense_grid_points(rois, grid_size)  # (B, R, g^3, 3)
    flat = rotate_points_along_z(
        local.reshape(b * r, -1, 3), rois[..., 6].reshape(-1))
    return flat.reshape(b, r, -1, 3) + rois[..., None, 0:3]


class PVRCNNHead(nn.Module):
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
        g = int(cfg['ROI_GRID_POOL']['GRID_SIZE'])

        # --- RoI grid pooling (:73-119) ---
        kp = batch['point_coords']  # (B, K, 3) keypoints
        kp_feats = batch['point_features'] * \
            jax.lax.stop_gradient(batch['point_cls_scores'])[..., None]
        kp_num = batch.get('num_keypoints',
                           batch['point_valid'].sum(axis=1).astype(jnp.int32))

        grid_pts = get_global_grid_points_of_roi(rois[..., :7], g)
        grid_flat = grid_pts.reshape(b, r * g ** 3, 3)
        grid_num = jnp.full((b,), r * g ** 3, jnp.int32)

        pool_cfg = cfg['ROI_GRID_POOL']
        _, pooled, _ = PointnetSAModuleMSG(
            npoint=r * g ** 3, radii=tuple(pool_cfg['POOL_RADIUS']),
            nsamples=tuple(pool_cfg['NSAMPLE']),
            mlps=tuple(tuple(m) for m in pool_cfg['MLPS']),
            use_xyz=True, zero_empty=True,
            axis_name=self.axis_name, dtype=self.dtype,
        )(kp, kp_feats, kp_num, training, new_xyz=grid_flat,
          new_xyz_num=grid_num)
        # (B, R*g^3, C) -> (B*R, g^3*C), torch layout (C, g^3) flattened:
        pooled = pooled.reshape(b * r, g ** 3, -1)
        pooled = jnp.swapaxes(pooled, 1, 2).reshape(b * r, -1)

        # --- shared FC + heads (:28-51, :158-170) ---
        x = pooled
        for c in cfg['SHARED_FC']:
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=False, dtype=self.dtype)(x)
            x = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(x)
            x = nn.relu(x)
            if cfg.get('DP_RATIO', 0) > 0:
                x = nn.Dropout(cfg['DP_RATIO'], deterministic=not training)(x)
        shared = x

        rcnn_cls = FCHead(tuple(cfg['CLS_FC']), self.num_class,
                          dtype=self.dtype, axis_name=self.axis_name)(
            shared, training)
        reg_tracking = bool(cfg['TARGET_CONFIG'].get('REG_TRACKING_INFO', False))
        rcnn_reg = FCHead(tuple(cfg['REG_FC']),
                          self.box_coder.code_size * self.num_class
                          + (8 if reg_tracking else 0),
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
            fwd['reg_tracking_info'] = reg_tracking
        out['roi_head_fwd'] = fwd
        return out

    def loss(self, fwd):
        loss_cfg = self.model_cfg['LOSS_CONFIG']
        cls_loss, tb_cls = roi_head_utils.roi_cls_loss(fwd, loss_cfg)
        reg_loss, tb_reg = roi_head_utils.roi_box_loss(fwd, self.box_coder,
                                                       loss_cfg)
        total = cls_loss + reg_loss
        return total, {**tb_cls, **tb_reg, 'rcnn_loss': total}
