"""Voxel feature encoders.

Batch layout: voxels (B, V, P, C) fixed-capacity, voxel_num_points (B, V)
int32 (0 marks an empty/padding slot), voxel_coords (B, V, 3) int32 (z, y, x)
with -1 padding. Replaces the stacked ragged layout of the reference
(DatasetTemplate.collate_batch, pcdet/datasets/dataset.py:153) — per-sample
fixed capacity shards cleanly over a data mesh axis.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import BN_EPS, BN_MOMENTUM, MaskedBatchNorm


class MeanVFE(nn.Module):
    """Mean of points per voxel (mean_vfe.py:15-32)."""

    @nn.compact
    def __call__(self, batch, training=False):
        voxels = batch['voxels']  # (B, V, P, C)
        npts = batch['voxel_num_points']  # (B, V)
        denom = jnp.clip(npts.astype(voxels.dtype), 1.0, None)[..., None]
        mean = voxels.sum(axis=2) / denom  # (B, V, C)
        return {**batch, 'voxel_features': mean}


class PFNLayer(nn.Module):
    """Linear(+BN)+ReLU then max over points (pillar_vfe.py:8-50)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, valid_mask, training):
        # x: (B, V, P, C); valid_mask: (B, V) pillar validity — all P point
        # rows of a valid pillar enter the BN statistics, matching the
        # reference's BatchNorm1d over (num_pillars, C, P) (pillar_vfe.py:39).
        out = self.out_channels if self.last_layer else self.out_channels // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(out, use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            mask = jnp.broadcast_to(valid_mask[..., None], x.shape[:-1])
            x = MaskedBatchNorm(use_running_average=not training,
                                axis_name=self.axis_name)(x, mask=mask)
        x = nn.relu(x)
        x_max = x.max(axis=2, keepdims=True)  # (B, V, 1, C')
        if self.last_layer:
            return x_max.squeeze(2)
        return jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)


class PillarVFE(nn.Module):
    """Pillar feature network (pillar_vfe.py:53-123).

    Features per point: [xyz+feats (or feats only), cluster offset, center
    offset, (dist)] masked to zero for padding points, then PFN stack.
    """

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        use_abs_xyz = cfg.get('USE_ABSLOTE_XYZ', True)  # sic — reference key
        with_distance = cfg.get('WITH_DISTANCE', False)
        num_filters = list(cfg['NUM_FILTERS'])

        voxels = batch['voxels']  # (B, V, P, C)
        npts = batch['voxel_num_points']  # (B, V)
        coords = batch['voxel_coords']  # (B, V, 3) zyx

        p = voxels.shape[2]
        pillar_valid = npts > 0
        denom = jnp.clip(npts.astype(voxels.dtype), 1.0, None)[..., None, None]
        points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / denom
        f_cluster = voxels[..., :3] - points_mean

        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]
        cx = coords[..., 2:3].astype(voxels.dtype) * vx + x_off  # (B, V, 1)
        cy = coords[..., 1:2].astype(voxels.dtype) * vy + y_off
        cz = coords[..., 0:1].astype(voxels.dtype) * vz + z_off
        f_center = jnp.stack(
            [voxels[..., 0] - cx, voxels[..., 1] - cy, voxels[..., 2] - cz],
            axis=-1)

        fast = (len(num_filters) == 1 and cfg.get('USE_NORM', True)
                and use_abs_xyz and not with_distance
                and voxels.shape[-1] == 4)
        if fast:
            features = self._single_pfn(
                voxels, npts, pillar_valid, points_mean,
                jnp.concatenate([cx, cy, cz], axis=-1), f_cluster, f_center,
                num_filters[0], training)
        else:
            feats = [voxels if use_abs_xyz else voxels[..., 3:], f_cluster,
                     f_center]
            if with_distance:
                feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                             keepdims=True))
            features = jnp.concatenate(feats, axis=-1)

            # zero padding points AND padding pillars (pillar_vfe.py:115-117)
            point_mask = (
                jnp.arange(p)[None, None, :] < npts[..., None]
            ) & pillar_valid[..., None]
            features = features * point_mask[..., None].astype(features.dtype)

            for i, nf in enumerate(num_filters):
                features = PFNLayer(
                    out_channels=nf,
                    use_norm=cfg.get('USE_NORM', True),
                    last_layer=(i == len(num_filters) - 1),
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                )(features, pillar_valid, training)

        # (B, V, C_out); zero invalid pillars so the scatter writes zeros
        features = features * pillar_valid[..., None].astype(features.dtype)
        return {**batch, 'pillar_features': features}

    def _single_pfn(self, voxels, npts, pillar_valid, points_mean, centers,
                    f_cluster, f_center, c_out, training):
        """Single-PFN fast path with the params owned here so training (XLA,
        batch statistics) and eval (fused Pallas kernel / decomposed XLA)
        share them. Feature order matches the concat path:
        K rows = [xyz (3), intensity (1), cluster (3), center (3)]."""
        cdt = self.dtype or voxels.dtype
        kernel = self.param('pfn_kernel', nn.initializers.lecun_normal(),
                            (10, c_out))
        scale = self.param('pfn_bn_scale', nn.initializers.ones, (c_out,))
        bias = self.param('pfn_bn_bias', nn.initializers.zeros, (c_out,))
        ra_mean = self.variable('batch_stats', 'pfn_mean',
                                lambda: jnp.zeros(c_out, jnp.float32))
        ra_var = self.variable('batch_stats', 'pfn_var',
                               lambda: jnp.ones(c_out, jnp.float32))
        b, v, p, _ = voxels.shape

        if training:
            point_mask = (
                jnp.arange(p)[None, None, :] < npts[..., None]
            ) & pillar_valid[..., None]
            aug = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)
            aug = aug * point_mask[..., None].astype(aug.dtype)
            z = aug.astype(cdt) @ kernel.astype(cdt)  # (B, V, P, C)
            zf = z.astype(jnp.float32)
            m = jnp.broadcast_to(pillar_valid[..., None, None], zf.shape[:3]
                                 + (1,)).astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum((zf * m).sum((0, 1, 2)), self.axis_name)
                s2 = jax.lax.psum((zf * zf * m).sum((0, 1, 2)),
                                  self.axis_name)
            else:
                s1 = (zf * m).sum((0, 1, 2))
                s2 = (zf * zf * m).sum((0, 1, 2))
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value \
                    + (1 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value \
                    + (1 - BN_MOMENTUM) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + BN_EPS) * scale
        shift = bias - mean * inv
        if training:
            x = z * inv.astype(z.dtype) + shift.astype(z.dtype)
            return nn.relu(x).max(axis=2)

        # eval: algebraic decomposition (see ops/vfe_tpu.py)
        k_xyz, k_i = kernel[0:3], kernel[3:4]
        k_cl, k_ce = kernel[4:7], kernel[7:10]
        w4 = jnp.concatenate([k_xyz + k_cl + k_ce, k_i], axis=0) \
            * inv[None, :]  # (4, C)
        mean_c = points_mean.squeeze(2) - centers  # (B, V, 3)
        pillar_bias = (centers @ k_xyz - mean_c @ k_cl) * inv[None, None] \
            + shift  # (B, V, C) f32
        vox4 = voxels
        ctr4 = jnp.concatenate(
            [centers, jnp.zeros(centers.shape[:-1] + (1,), centers.dtype)],
            axis=-1)
        if jax.devices()[0].platform == 'tpu' and vox4.shape[-1] == 4 \
                and (p & (p - 1)) == 0:
            # block-diag Pallas kernel (ops/vfe_tpu.py): keeps the (B,V,P,C)
            # point activations in VMEM — the XLA path below materializes
            # them (~400 MB/batch at bucketed KITTI eval shapes). Measured
            # with relay-free slope timing on v5e: 0.44 ms vs ~1.9 ms XLA
            # at 8x12288x32 (an earlier comparison favoring XLA was
            # distorted by the axon dispatch round trip).
            from ...ops.vfe_tpu import pillar_vfe_fused
            return pillar_vfe_fused(vox4, ctr4, pillar_bias, npts, w4, shift,
                                    out_dtype=cdt)
        # XLA fallback: identical math, materialized point dim.
        # The bias/mask/max run in the compute dtype: the downstream canvas
        # is cdt anyway, and an f32 (B, V, P, C) intermediate costs ~330 MB
        # of HBM traffic per KITTI eval batch.
        xc = vox4 - ctr4[:, :, None, :]
        z = xc.astype(cdt) @ w4.astype(cdt) \
            + pillar_bias[:, :, None].astype(cdt)
        rows = jnp.arange(p)[None, None, :]
        neg = jnp.asarray(-jnp.inf, z.dtype)
        z = jnp.where((rows < npts[..., None])[..., None], z, neg)
        m = z.max(axis=2)
        pad_val = jnp.where((npts < p)[..., None], shift[None, None].astype(
            z.dtype), neg)
        return nn.relu(jnp.maximum(m, pad_val)).astype(cdt)
