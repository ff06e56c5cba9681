"""PointRCNN second stage (pcdet/models/roi_heads/pointrcnn_head.py:10-177).

RoI point pooling (512 pts/RoI) -> canonical transform -> xyz-up MLP +
merge-down -> PointNet SA stack over each RoI's points -> cls/reg FCs.
The reference flattens (B*R) RoIs into a pseudo-batch for the SA modules;
here the same reshape feeds the vmapped SA modules.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.box_coders import build_box_coder
from ...core.geometry import enlarge_box3d, rotate_points_along_z
from ...ops.roi_pool import roipoint_pool3d
from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG
from ..layers import MaskedBatchNorm
from . import roi_head_utils


class ConvMLP(nn.Module):
    """1x1 Conv(+BN)+ReLU stack (channels-last Dense)."""

    channels: tuple
    use_bn: bool = False
    dtype: object = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training):
        for c in self.channels:
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype)(x)
            if self.use_bn:
                x = MaskedBatchNorm(use_running_average=not training,
                                    momentum=0.9, epsilon=1e-5,
                                    axis_name=self.axis_name)(x)
            x = nn.relu(x)
        return x


class FCHead(nn.Module):
    """make_fc_layers (roi_head_template.py:29-43): Conv1d+BN+ReLU stack +
    final linear."""

    fc_list: tuple
    output_channels: int
    dtype: object = None
    axis_name: str | None = None
    final_init_std: float | None = None

    @nn.compact
    def __call__(self, x, training):
        for c in self.fc_list:
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=False, dtype=self.dtype)(x)
            x = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(x)
            x = nn.relu(x)
        kernel_init = (nn.initializers.normal(self.final_init_std)
                       if self.final_init_std else nn.initializers.lecun_normal())
        return nn.Dense(self.output_channels, kernel_init=kernel_init)(
            x.astype(jnp.float32))


class PointRCNNHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1
    dtype: object = None
    axis_name: str | None = None
    # TPU approximation knobs (ops.pointnet2.PointOpKnobs; None = exact)
    knobs: object = None

    def setup(self):
        tc = self.model_cfg['TARGET_CONFIG']
        self.box_coder = build_box_coder(tc['BOX_CODER'],
                                         **tc.get('BOX_CODER_CONFIG', {}))

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        use_bn = cfg.get('USE_BN', False)
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

        rois = out['rois']  # (B, R, 7+)
        b, r = rois.shape[:2]

        # --- RoI point pooling + canonical transform (:88-135) ---
        pool_cfg = cfg['ROI_POINT_POOL']
        point_coords = batch['point_coords']  # (B, N, 3)
        point_feats = batch['point_features']  # (B, N, C)
        scores = jax.lax.stop_gradient(out['point_cls_scores'])  # (B, N)
        depths = jnp.linalg.norm(point_coords, axis=-1) / \
            pool_cfg['DEPTH_NORMALIZER'] - 0.5
        feats_all = jnp.concatenate(
            [scores[..., None], depths[..., None], point_feats], axis=-1)

        pool_rois = jax.vmap(lambda bx: enlarge_box3d(
            bx[:, :7], tuple(pool_cfg['POOL_EXTRA_WIDTH'])))(rois)
        pooled, empty = roipoint_pool3d(
            point_coords, feats_all, batch['num_points'], pool_rois,
            out['roi_valid'],
            num_sampled_points=int(pool_cfg['NUM_SAMPLED_POINTS']))
        pooled = jax.lax.stop_gradient(pooled)  # reference pools in no_grad
        s = pooled.shape[2]
        local_xyz = pooled[..., 0:3] - rois[..., None, 0:3]
        local_xyz = rotate_points_along_z(
            local_xyz.reshape(b * r, s, 3), -rois[..., 6].reshape(-1)
        ).reshape(b, r, s, 3)
        pooled = jnp.concatenate([local_xyz, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)

        # --- xyz-up + merge (:19-33, :151-157) ---
        n_prefix = 5  # xyz + score + depth
        xyz_in = pooled[..., 0:n_prefix]
        xyz_feats = ConvMLP(tuple(cfg['XYZ_UP_LAYER']), use_bn=use_bn,
                            dtype=self.dtype, axis_name=self.axis_name)(
            xyz_in, training)
        pt_feats = pooled[..., n_prefix:]
        merged = jnp.concatenate([xyz_feats, pt_feats], axis=-1)
        merged = ConvMLP((cfg['XYZ_UP_LAYER'][-1],), use_bn=use_bn,
                         dtype=self.dtype, axis_name=self.axis_name)(
            merged, training)

        # --- per-RoI SA stack (:159-165) ---
        sa_cfg = cfg['SA_CONFIG']
        xyz = pooled[..., 0:3].reshape(b * r, s, 3)
        feats = merged.reshape(b * r, s, -1)
        num = jnp.full((b * r,), s, jnp.int32)
        for k in range(len(sa_cfg['NPOINTS'])):
            npoint = sa_cfg['NPOINTS'][k]
            xyz, feats, num = PointnetSAModuleMSG(
                npoint=None if npoint == -1 else npoint,
                radii=(sa_cfg['RADIUS'][k],),
                nsamples=(sa_cfg['NSAMPLE'][k],),
                mlps=(tuple(sa_cfg['MLPS'][k]),),
                use_xyz=True, axis_name=self.axis_name, dtype=self.dtype,
                knobs=self.knobs,
            )(xyz, feats, num, training)

        shared = feats.reshape(b * r, -1)  # (B*R, C)
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
