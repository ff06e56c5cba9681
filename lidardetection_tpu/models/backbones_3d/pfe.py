"""Voxel Set Abstraction (PV-RCNN keypoint feature extraction).

Re-expresses pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:43-240:
per-scene FPS keypoints from raw points, multi-source feature aggregation
(bilinear BEV interpolation + stack-SA over raw points and every sparse
conv scale's voxel centers), fused through a Linear+BN+ReLU.

The reference's per-sample python loops (FPS :134-155, BEV interp :107-116,
batch-count bookkeeping) are vmapped; the ragged stack layout becomes the
(B, V, ...) fixed-capacity SparseTensor stages already produced by the
backbone.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.geometry import get_voxel_centers
from ...ops import pointnet2 as p2
from ..layers import MaskedBatchNorm
from .pointnet2_modules import PointnetSAModuleMSG


def bilinear_interpolate(im, x, y):
    """(H, W, C), (N,), (N,) -> (N, C) (voxel_set_abstraction.py:9-40)."""
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1
    x0c = jnp.clip(x0, 0, im.shape[1] - 1)
    x1c = jnp.clip(x1, 0, im.shape[1] - 1)
    y0c = jnp.clip(y0, 0, im.shape[0] - 1)
    y1c = jnp.clip(y1, 0, im.shape[0] - 1)
    ia = im[y0c, x0c]
    ib = im[y1c, x0c]
    ic = im[y0c, x1c]
    id_ = im[y1c, x1c]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (ia * wa[:, None] + ib * wb[:, None] + ic * wc[:, None]
            + id_ * wd[:, None])


class VoxelSetAbstraction(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple
    num_bev_features: int
    num_rawpoint_features: int
    dtype: object = None
    axis_name: str | None = None
    # TPU approximation knobs (ops.pointnet2.PointOpKnobs; None = exact)
    knobs: object = None

    @property
    def num_point_features(self):
        return self.model_cfg['NUM_OUTPUT_FEATURES']

    def _sa_cfg(self, src):
        return self.model_cfg['SA_LAYER'][src]

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        num_kp = int(cfg['NUM_KEYPOINTS'])
        out = dict(batch)

        # --- keypoint sampling (get_sampled_points, :119-157) ---
        assert cfg.get('POINT_SOURCE', 'raw_points') == 'raw_points'
        assert cfg.get('SAMPLE_METHOD', 'FPS') == 'FPS'
        points = batch['points']  # (B, N, 3+C)
        num_points = batch['num_points']
        kp_idx = p2.fps(points[..., 0:3], num_points, num_kp,
                        knobs=self.knobs)
        keypoints = p2.group_points(points[..., 0:3], kp_idx[..., None]).squeeze(2)
        kp_num = jnp.minimum(num_points, num_kp)
        kp_valid = jnp.arange(num_kp)[None, :] < kp_num[:, None]

        feats_list = []
        if 'bev' in cfg['FEATURES_SOURCE']:
            stride = batch.get('spatial_features_stride', 8)
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x_idx = (keypoints[..., 0] - self.point_cloud_range[0]) / vx / stride
            y_idx = (keypoints[..., 1] - self.point_cloud_range[1]) / vy / stride
            bev = batch['spatial_features'].astype(jnp.float32)  # (B, H, W, C)
            bev_feats = jax.vmap(bilinear_interpolate)(bev, x_idx, y_idx)
            feats_list.append(bev_feats)

        if 'raw_points' in cfg['FEATURES_SOURCE']:
            sa = self._sa_cfg('raw_points')
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            _, pooled, _ = PointnetSAModuleMSG(
                npoint=num_kp, radii=tuple(sa['POOL_RADIUS']),
                nsamples=tuple(sa['NSAMPLE']),
                mlps=tuple(tuple(m) for m in sa['MLPS']),
                use_xyz=True, zero_empty=True,
                axis_name=self.axis_name, dtype=self.dtype,
                knobs=self.knobs,
            )(points[..., 0:3], raw_feats, num_points, training,
              new_xyz=keypoints, new_xyz_num=kp_num)
            feats_list.append(pooled)

        for src in cfg['FEATURES_SOURCE']:
            if src in ('bev', 'raw_points'):
                continue
            sa = self._sa_cfg(src)
            st = batch['multi_scale_3d_features'][src]
            centers = jax.vmap(lambda c: get_voxel_centers(
                c, sa['DOWNSAMPLE_FACTOR'], self.voxel_size,
                self.point_cloud_range))(st.coords)
            src_valid_num = (st.coords[..., 0] >= 0).sum(axis=1)
            # voxel tables are key-sorted with padding at the tail, so the
            # valid rows form a prefix — the count-based mask is exact
            _, pooled, _ = PointnetSAModuleMSG(
                npoint=num_kp, radii=tuple(sa['POOL_RADIUS']),
                nsamples=tuple(sa['NSAMPLE']),
                mlps=tuple(tuple(m) for m in sa['MLPS']),
                use_xyz=True, zero_empty=True,
                axis_name=self.axis_name, dtype=self.dtype,
                knobs=self.knobs,
            )(centers, st.features.astype(jnp.float32), src_valid_num,
              training, new_xyz=keypoints, new_xyz_num=kp_num)
            feats_list.append(pooled)

        point_features = jnp.concatenate(feats_list, axis=-1)  # (B, K, C_in)
        out['point_features_before_fusion'] = point_features

        fused = nn.Dense(cfg['NUM_OUTPUT_FEATURES'], use_bias=False)(
            point_features)
        fused = MaskedBatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(
            fused, mask=kp_valid)
        fused = nn.relu(fused)

        out['point_features'] = fused * kp_valid[..., None]
        out['point_coords'] = keypoints
        out['point_valid'] = kp_valid
        out['num_keypoints'] = kp_num
        return out
