"""PointNet2MSG backbone for PointRCNN.

Mirrors pcdet/models/backbones_3d/pointnet2_backbone.py:9-96: SA x4 with MSG
+ FP x4 over the raw point cloud, producing per-point features at the
original resolution. Batch layout: points (B, N, 3+C) fixed-capacity +
num_points (the reference's flat batch-idx layout exists only for ragged
batching).
"""

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2_modules import PointnetFPModule, PointnetSAModuleMSG


class PointNet2MSG(nn.Module):
    model_cfg: dict
    input_channels: int  # 3 + C point features (x, y, z first)
    axis_name: str | None = None
    dtype: object = None
    # TPU approximation knobs (ops.pointnet2.PointOpKnobs; None = exact)
    knobs: object = None

    @property
    def num_point_features(self):
        return self.model_cfg['FP_MLPS'][0][-1]

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        sa_cfg = cfg['SA_CONFIG']
        points = batch['points']  # (B, N, 3 + C)
        num = batch['num_points']  # (B,)
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        channel_in = self.input_channels - 3
        skip_channels = [channel_in]
        mlps_all = []
        for k in range(len(sa_cfg['NPOINTS'])):
            mlps = [list(m) for m in sa_cfg['MLPS'][k]]
            channel_out = sum(m[-1] for m in mlps)
            mlps_all.append(mlps)
            skip_channels.append(channel_out)
            channel_in = channel_out

        l_xyz, l_feats, l_num = [xyz], [features], [num]
        for k in range(len(sa_cfg['NPOINTS'])):
            new_xyz, new_feats, new_num = PointnetSAModuleMSG(
                npoint=sa_cfg['NPOINTS'][k],
                radii=tuple(sa_cfg['RADIUS'][k]),
                nsamples=tuple(sa_cfg['NSAMPLE'][k]),
                mlps=tuple(tuple(m) for m in mlps_all[k]),
                use_xyz=sa_cfg.get('USE_XYZ', True),
                axis_name=self.axis_name, dtype=self.dtype,
                knobs=self.knobs,
            )(l_xyz[k], l_feats[k], l_num[k], training)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)
            l_num.append(new_num)

        fp_mlps = cfg['FP_MLPS']
        for i in range(-1, -(len(fp_mlps) + 1), -1):
            l_feats[i - 1] = PointnetFPModule(
                mlp=tuple(fp_mlps[i]), axis_name=self.axis_name,
                dtype=self.dtype,
            )(l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i],
              l_num[i - 1], l_num[i], training)

        out = dict(batch)
        out['point_features'] = l_feats[0].astype(jnp.float32)  # (B, N, C)
        out['point_coords'] = xyz  # (B, N, 3)
        return out
