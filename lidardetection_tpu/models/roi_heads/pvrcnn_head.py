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
from ...ops import pointnet2 as p2
from ..backbones_3d.pointnet2_modules import SharedMLP
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


class RoIGridPool(nn.Module):
    """RoI-grid pooling via per-RoI candidate prefilter + rank-select MXU
    einsums (pvrcnn_head.py:73-119 re-designed for TPU).

    The reference ball-queries every grid point against every keypoint
    (R*g^3 x K pairwise + per-point first-nsample scan). Here: (1) each RoI
    prefilters the k_cand lowest-index keypoints within
    half_diagonal + max_radius of its center (all its grid points' in-radius
    neighbors by construction, `ops.pointnet2.roi_candidates`); (2) per grid
    point, first-nsample-by-index selection over the K candidate lanes is a
    boolean rank matrix (`candidate_rank_select`) contracted against the
    candidate coords+features on the MXU — no wide top_k, no per-element
    index gathers.
    """

    radii: tuple
    nsamples: tuple
    mlps: tuple
    k_cand: int = 128
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, kp_xyz, kp_feats, kp_num, rois, roi_valid, grid_pts,
                 training):
        """kp_xyz (B, N, 3); kp_feats (B, N, C); kp_num (B,);
        rois (B, R, 7); roi_valid (B, R); grid_pts (B, R, G, 3).
        Returns pooled (B, R, G, sum C_out)."""
        b, rr, gg = grid_pts.shape[:3]
        # eps-guarded norm: padded rois have zero sizes and d||x||/dx is
        # NaN at 0 (core/losses._safe_norm rationale)
        r_cand = (0.5 * jnp.sqrt(jnp.maximum(
            jnp.sum(rois[..., 3:6] ** 2, axis=-1), 1e-12))
                  + float(max(self.radii)))
        r_cand = jnp.where(roi_valid, r_cand, 0.0)
        cand_idx, cand_live = p2.roi_candidates(
            kp_xyz, kp_num, rois[..., 0:3], r_cand, self.k_cand)

        # project source features once per radius, then ONE row gather for
        # coords + all projections together (gathers bill per index)
        c0s = [int(m[0]) for m in self.mlps]
        feats_in = kp_feats
        if self.dtype is not None:
            feats_in = feats_in.astype(self.dtype)
        projs = [nn.Dense(c0, use_bias=False, dtype=self.dtype,
                          name=f'pre_proj_{ri}')(feats_in)
                 for ri, c0 in enumerate(c0s)]
        packed = jnp.concatenate(
            [kp_xyz] + [p.astype(jnp.float32) for p in projs], axis=-1)
        cand = p2.group_points(packed, cand_idx.reshape(b, rr * self.k_cand))
        cand = cand.reshape(b, rr, self.k_cand, -1)
        cand_xyz = cand[..., 0:3]

        outs = []
        col = 3
        for ri, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            c0 = c0s[ri]
            sel, empty = p2.candidate_rank_select(
                cand_xyz, cand_live, grid_pts, radius, nsample)
            # x[slot] = feats[sel] + W_xyz (xyz[sel] - grid)
            #         = (feats + W_xyz xyz)[sel] - W_xyz grid:
            # project the K candidates ONCE and subtract the grid term
            # after the selection einsum — no (B,R,G,ns,3) gathered-xyz
            # tensor and no per-slot Dense (selection is linear).
            # Re-center on the RoI center in f32 BEFORE any bf16 cast:
            # W(c-ctr)[sel] - W(g-ctr) == W(c)[sel] - W(g) exactly, but at
            # KITTI ranges (~70 m) bf16 rounds absolute coords by ~0.14 m
            # while the offset signal is <= radius — centered inputs stay
            # small-magnitude so the relative-position feature keeps ~0.4%
            # noise instead of ~10-20%.
            ctr = rois[..., None, 0:3]
            cxyz_in = cand_xyz - ctr
            gpts_in = grid_pts - ctr
            if self.dtype is not None:
                cxyz_in = cxyz_in.astype(self.dtype)
                gpts_in = gpts_in.astype(self.dtype)
            xyz_proj = nn.Dense(c0, use_bias=False, dtype=self.dtype,
                                name=f'xyz_proj_{ri}')
            cand_proj = (cand[..., col:col + c0].astype(
                projs[ri].dtype) + xyz_proj(cxyz_in))
            selw = sel.astype(cand_proj.dtype)
            grp = jnp.einsum('brgsk,brkc->brgsc', selw, cand_proj,
                             preferred_element_type=jnp.float32)
            x = grp.astype(cand_proj.dtype) \
                - xyz_proj(gpts_in)[:, :, :, None, :]
            x = jnp.where(empty[..., None, None], 0.0, x)
            x = x.reshape(b, rr * gg, nsample, c0)
            mask = jnp.broadcast_to(
                jnp.repeat(roi_valid, gg, axis=1)[:, :, None], x.shape[:3])
            x = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name,
                                name=f'pre_bn_{ri}')(x, mask=mask)
            x = nn.relu(x)
            out = SharedMLP(tuple(mlp[1:]), axis_name=self.axis_name,
                            dtype=self.dtype)(x, mask, training)
            out = out.max(axis=2).reshape(b, rr, gg, -1)
            keep = (roi_valid[:, :, None] & ~empty)[..., None]
            outs.append(out * keep.astype(out.dtype))
            col += c0
        return jnp.concatenate(outs, axis=-1)


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

        pool_cfg = cfg['ROI_GRID_POOL']
        pooled = RoIGridPool(
            radii=tuple(pool_cfg['POOL_RADIUS']),
            nsamples=tuple(pool_cfg['NSAMPLE']),
            mlps=tuple(tuple(m) for m in pool_cfg['MLPS']),
            k_cand=int(pool_cfg.get('CANDIDATE_CAP', 128)),
            axis_name=self.axis_name, dtype=self.dtype,
        )(kp, kp_feats, kp_num, rois[..., :7], out['roi_valid'],
          grid_pts, training)
        # (B, R, g^3, C) -> (B*R, g^3*C), torch layout (C, g^3) flattened:
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
