"""PointNet++ SA / FP flax modules (channels-last).

Re-expresses pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py:10-160
(PointnetSAModuleMSG / PointnetSAModule / PointnetFPModule) on the ops in
lidardetection_tpu.ops.pointnet2. The shared MLPs are 1x1 Conv2d+BN+ReLU in
the reference — here Dense+BN+ReLU over the (B, M, nsample, C) group tensor.
SA/FP BatchNorms use torch defaults (eps 1e-5, momentum 0.1 -> flax 0.9),
unlike the detector's 1e-3/0.01 BNs.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointnet2 as p2
from ..layers import MaskedBatchNorm


class SharedMLP(nn.Module):
    """Stack of Dense+BN+ReLU over the trailing channel dim."""

    channels: tuple
    axis_name: str | None = None
    dtype: object = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, mask, training):
        for c in self.channels:
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype)(x)
            if self.use_bn:
                x = MaskedBatchNorm(use_running_average=not training,
                                    momentum=0.9, epsilon=1e-5,
                                    axis_name=self.axis_name)(x, mask=mask)
            x = nn.relu(x)
        return x


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (pointnet2_modules.py:58-100).

    npoint None => GroupAll (single global group).
    """

    npoint: int | None
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of channel tuples (without the input dim)
    use_xyz: bool = True
    axis_name: str | None = None
    dtype: object = None
    # stack-layout semantics (pointnet2_stack QueryAndGroup): groups whose
    # ball query found no neighbor output zeros instead of a repeated fill
    zero_empty: bool = False
    # TPU approximation knobs (ops.pointnet2.PointOpKnobs; None = exact)
    knobs: object = None

    @nn.compact
    def __call__(self, xyz, features, xyz_num, training, new_xyz=None,
                 new_xyz_num=None):
        """xyz (B, N, 3); features (B, N, C) or None; xyz_num (B,).

        Returns new_xyz (B, npoint, 3), new_features (B, npoint, sum C_out),
        new_xyz_num (B,).
        """
        b, n, _ = xyz.shape
        if self.npoint is not None:
            if new_xyz is None:
                fps_idx = p2.fps(xyz, xyz_num, self.npoint, knobs=self.knobs)
                new_xyz = p2.group_points(xyz, fps_idx[..., None]).squeeze(2)
                new_xyz_num = jnp.minimum(xyz_num, self.npoint)
            center_valid = jnp.arange(new_xyz.shape[1])[None, :] < new_xyz_num[:, None]
        else:
            new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
            new_xyz_num = jnp.ones((b,), jnp.int32)
            center_valid = jnp.ones((b, 1), bool)

        outs = []
        if self.npoint is not None:
            # one grid + candidate gather shared across the MSG radii
            queries = p2.ball_query_multi(self.radii, self.nsamples, xyz,
                                          xyz_num, new_xyz, center_valid,
                                          knobs=self.knobs)
        packed = None
        c0s = [int(m[0]) for m in self.mlps]
        if self.npoint is not None and features is not None:
            # Split first MLP layer: Dense is linear and grouping is a
            # gather, so Dense(gather(feats)) == gather(Dense(feats)).
            # Project the N source features ONCE per radius (N x C x c0)
            # instead of per slot (M x nsample x C x c0) — at RoI-grid-pool
            # shapes (M=R*6^3, C=128) this removes ~20x of first-layer
            # FLOPs — then pack [xyz | proj_0 | proj_1 ...] so each radius
    # groups with ONE row gather (XLA:TPU gathers bill ~12 ns per
            # INDEX regardless of row width; separate xyz + proj gathers
            # doubled the billed indices).
            feats_in = features
            if self.dtype is not None:
                feats_in = feats_in.astype(self.dtype)
            projs = [nn.Dense(c0, use_bias=False, dtype=self.dtype,
                              name=f'pre_proj_{ri}')(feats_in)
                     for ri, c0 in enumerate(c0s)]
            # bf16 projections ride as bit-cast f32 pairs so xyz keeps f32
            # precision and the row stays one dtype (halves gather bytes
            # vs upcasting the features). EVAL ONLY: bitcast_convert_type
            # has a zero JVP/VJP in JAX, so the pack/unpack pair silently
            # kills gradients to pre_proj and everything upstream; a
            # custom_vjp inverse-bitcast would also be wrong because the
            # gather transpose scatter-ADDS cotangents in the packed f32
            # domain (bit-pair addition != pairwise bf16 addition). When
            # training, pack as f32 instead — row gathers bill per index,
            # not per byte, so only HBM bytes double.
            bf16 = self.dtype == jnp.bfloat16 and not training
            if bf16:
                def as_f32bits(p):
                    bn, nn_, c0 = p.shape
                    return jax.lax.bitcast_convert_type(
                        p.astype(jnp.bfloat16).reshape(bn, nn_, c0 // 2, 2),
                        jnp.float32)
                projs_packed = [as_f32bits(p) for p in projs]
            else:
                projs_packed = [p.astype(xyz.dtype) for p in projs]
            packed = jnp.concatenate([xyz] + projs_packed, axis=-1)
            cols = [c.shape[-1] for c in projs_packed]
        for ri, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if packed is not None:
                idx, empty = queries[ri]
                c0 = c0s[ri]
                col = 3 + sum(cols[:ri])
                grp = p2.group_points(packed, idx)  # (B, M, ns, 3+sum cols)
                grouped_xyz = grp[..., 0:3] - new_xyz[:, :, None, :]
                x = grp[..., col:col + cols[ri]]
                if bf16:
                    bm, mm, ns_ = x.shape[:3]
                    x = jax.lax.bitcast_convert_type(
                        x, jnp.bfloat16).reshape(bm, mm, ns_, c0)
                elif self.dtype is not None:
                    x = x.astype(self.dtype)
                if self.use_xyz:
                    if self.dtype is not None:
                        grouped_xyz = grouped_xyz.astype(self.dtype)
                    x = x + nn.Dense(c0, use_bias=False, dtype=self.dtype,
                                     name=f'xyz_proj_{ri}')(grouped_xyz)
                mask = jnp.broadcast_to(center_valid[:, :, None], x.shape[:3])
                x = MaskedBatchNorm(use_running_average=not training,
                                    momentum=0.9, epsilon=1e-5,
                                    axis_name=self.axis_name,
                                    name=f'pre_bn_{ri}')(x, mask=mask)
                x = nn.relu(x)
                out = SharedMLP(tuple(mlp[1:]), axis_name=self.axis_name,
                                dtype=self.dtype)(x, mask, training)
                out = out.max(axis=2)  # (B, M, C_out)
                out = out * center_valid[..., None].astype(out.dtype)
                if self.zero_empty:
                    out = out * (~empty)[..., None].astype(out.dtype)
                outs.append(out)
                continue
            if self.npoint is not None:
                idx, empty = queries[ri]
                grouped_xyz = p2.group_points(xyz, idx) - new_xyz[:, :, None, :]
                grouped = grouped_xyz
            else:
                # GroupAll (pointnet2_utils.GroupAll): one group of all points
                grouped_xyz = xyz[:, None, :, :]
                grouped = grouped_xyz
                if features is not None:
                    gf = features[:, None, :, :]
                    grouped = jnp.concatenate([grouped_xyz, gf], axis=-1) \
                        if self.use_xyz else gf
            mask = jnp.broadcast_to(center_valid[:, :, None], grouped.shape[:3])
            out = SharedMLP(tuple(mlp), axis_name=self.axis_name,
                            dtype=self.dtype)(grouped, mask, training)
            out = out.max(axis=2)  # (B, M, C_out)
            out = out * center_valid[..., None].astype(out.dtype)
            if self.zero_empty and self.npoint is not None:
                out = out * (~empty)[..., None].astype(out.dtype)
            outs.append(out)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_xyz_num


class PointnetFPModule(nn.Module):
    """Feature propagation (pointnet2_modules.py:120-160)."""

    mlp: tuple
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 unknown_num, known_num, training):
        """unknown (B, n, 3), known (B, m, 3), feats channels-last."""
        dists, idx = p2.three_nn(unknown, None, known, known_num)
        weight = p2.three_nn_weights(dists)
        interpolated = p2.three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        mask = jnp.arange(unknown.shape[1])[None, :] < unknown_num[:, None]
        out = SharedMLP(tuple(self.mlp), axis_name=self.axis_name,
                        dtype=self.dtype)(new_features, mask, training)
        return out * mask[..., None].astype(out.dtype)
