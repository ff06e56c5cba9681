"""Sparse 3D CNN backbones (VoxelBackBone8x / VoxelResBackBone8x).

Re-expresses pcdet/models/backbones_3d/spconv_backbone.py on the
lidardetection_tpu.ops.sparse engine: 4-stage sparse CNN (16-32-64-64/128),
strides 1/2/2/2, final (3,1,1)/(2,1,1) z-compression to the stride-8 encoded
tensor + multi_scale_3d_features (:119-163). The reference's `indice_key`
rulebook caching (:84-106) corresponds to building each stage's rulebook once
per forward and reusing it across the stage's submanifold layers.

Sparse shape is grid_size[::-1] + [1, 0, 0] like the reference (D = nz + 1,
spconv_backbone.py:76-78).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops import sparse
from ..layers import MaskedBatchNorm


class SparseConvLayer(nn.Module):
    """One sparse conv (given a prebuilt rulebook) + BN + ReLU.

    subm=True marks a shared-table submanifold conv, whose training
    backward runs the Pallas kernel over the offset-flipped rulebook;
    down/inverse convs pass rb_bwd/in_valid (sparse.sparse_conv_apply).
    """

    out_channels: int
    kernel_volume: int
    use_norm: bool = True
    use_relu: bool = True
    axis_name: str | None = None
    dtype: object = None
    subm: bool = False

    @nn.compact
    def __call__(self, features, valid_mask, rulebook, training,
                 rb_bwd=None, in_valid=None):
        cin = features.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel_volume, cin, self.out_channels))
        if self.dtype is not None:
            features = features.astype(self.dtype)
            w = w.astype(self.dtype)
        out = sparse.sparse_conv_apply(features, valid_mask, rulebook, w,
                                       rb_bwd=rb_bwd, in_valid=in_valid,
                                       subm=self.subm)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        if self.use_norm:
            out = MaskedBatchNorm(use_running_average=not training,
                                  axis_name=self.axis_name)(out, mask=valid_mask)
        if self.use_relu:
            out = nn.relu(out)
        return out * valid_mask[..., None].astype(out.dtype)


class SparseBasicBlock(nn.Module):
    """Residual submanifold block (spconv_backbone.py:29-57)."""

    channels: int
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, features, valid_mask, rulebook, training):
        identity = features
        x = SparseConvLayer(self.channels, rulebook.shape[-1], subm=True,
                            axis_name=self.axis_name, dtype=self.dtype)(
            features, valid_mask, rulebook, training)
        x = SparseConvLayer(self.channels, rulebook.shape[-1], use_relu=False,
                            subm=True,
                            axis_name=self.axis_name, dtype=self.dtype)(
            x, valid_mask, rulebook, training)
        out = nn.relu(x + identity.astype(x.dtype))
        return out * valid_mask[..., None].astype(out.dtype)


def _stage_capacity(model_cfg, idx, default):
    caps = model_cfg.get('OUT_CAPACITIES', None)
    if caps is not None:
        return int(caps[idx])
    return default


class VoxelBackBone8x(nn.Module):
    """4-stage sparse CNN (spconv_backbone.py:60-163). Set `residual=True`
    for VoxelResBackBone8x (:166-261: SparseBasicBlocks, 128-ch stage 4)."""

    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    axis_name: str | None = None
    dtype: object = None
    residual: bool = False

    @property
    def num_point_features(self):
        return 128

    @property
    def backbone_channels(self):
        if self.residual:
            return {'x_conv1': 16, 'x_conv2': 32, 'x_conv3': 64, 'x_conv4': 128}
        return {'x_conv1': 16, 'x_conv2': 32, 'x_conv3': 64, 'x_conv4': 64}

    @nn.compact
    def __call__(self, batch, training=False):
        nx, ny, nz = self.grid_size
        spatial_shape = (nz + 1, ny, nx)  # grid[::-1] + [1,0,0]
        feats = batch['voxel_features']  # (B, V, C)
        coords = batch['voxel_coords']  # (B, V, 3) zyx
        cap = feats.shape[1]
        # host-built rulebooks (ops/sparse_plan.py): the data workers ship
        # every table; the device path is pure gather-GEMM with zero sorts
        host = 'rb_subm1' in batch

        if host:
            # the host voxelizer emits rows already in sorted-table order
            st = sparse.SparseTensor(feats, coords, batch['num_voxels'],
                                     spatial_shape)
        else:
            st = sparse.from_unsorted(feats, coords, batch['num_voxels'],
                                      spatial_shape)
        ax, dt = self.axis_name, self.dtype
        chans = self.backbone_channels

        def subm_stack(st, channels, n_blocks, name, first_plain=False):
            rule = (batch[f'rb_{name}'] if host
                    else sparse.build_subm_rulebook(st, (3, 3, 3)))
            vm = st.valid_mask
            f = st.features
            if first_plain:
                f = SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                    dtype=dt)(f, vm, rule, training)
            if self.residual:
                for _ in range(n_blocks):
                    f = SparseBasicBlock(channels, axis_name=ax, dtype=dt)(
                        f, vm, rule, training)
            else:
                for _ in range(n_blocks):
                    f = SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                        dtype=dt)(f, vm, rule, training)
            return st._replace(features=f)

        def downsample(st, channels, stride, padding, kernel, capacity, name):
            if host:
                out_coords = batch[f'rb_{name}_coords']
                out_num = batch[f'rb_{name}_num']
                rule = batch[f'rb_{name}']
                ks, s, p = (np.asarray(x) for x in (kernel, stride, padding))
                out_shape = tuple(
                    (np.asarray(st.spatial_shape) + 2 * p - (ks - 1) - 1) // s
                    + 1)
            else:
                out_coords, out_num, out_shape = (
                    sparse.build_strided_out_coords(
                        st, kernel, stride, padding, capacity))
                rule = sparse.build_strided_rulebook(
                    st, out_coords, out_shape, kernel, stride, padding)
            vm = out_coords[..., 0] >= 0
            # training backward: the plan ships a transposed rulebook
            # (rb_<name>_bwd over the INPUT table) when available
            rb_bwd = batch.get(f'rb_{name}_bwd') if host else None
            f = SparseConvLayer(channels, rule.shape[-1], axis_name=ax,
                                dtype=dt)(st.features, vm, rule, training,
                                          rb_bwd=rb_bwd,
                                          in_valid=st.valid_mask)
            return sparse.SparseTensor(f, out_coords, out_num, out_shape)

        # conv_input: SubMConv3d(C, 16) + conv1 stage
        st = subm_stack(st, chans['x_conv1'], 1, 'subm1', first_plain=True)
        x_conv1 = st

        st = downsample(st, chans['x_conv2'], (2, 2, 2), (1, 1, 1), (3, 3, 3),
                        _stage_capacity(self.model_cfg, 0, cap), 'down2')
        st = subm_stack(st, chans['x_conv2'], 2, 'subm2')
        x_conv2 = st

        st = downsample(st, chans['x_conv3'], (2, 2, 2), (1, 1, 1), (3, 3, 3),
                        _stage_capacity(self.model_cfg, 1, cap), 'down3')
        st = subm_stack(st, chans['x_conv3'], 2, 'subm3')
        x_conv3 = st

        st = downsample(st, chans['x_conv4'], (2, 2, 2), (0, 1, 1), (3, 3, 3),
                        _stage_capacity(self.model_cfg, 2, cap), 'down4')
        st = subm_stack(st, chans['x_conv4'], 2, 'subm4')
        x_conv4 = st

        # conv_out: z-compression (3,1,1)/(2,1,1), pad 0 -> stride 8 tensor
        st_out = downsample(st, 128, (2, 1, 1), (0, 0, 0), (3, 1, 1),
                            _stage_capacity(self.model_cfg, 3, cap), 'out')

        out = dict(batch)
        out['encoded_spconv_tensor'] = sparse.sparse_to_dense(st_out)
        out['encoded_spconv_tensor_stride'] = 8
        out['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        out['multi_scale_3d_strides'] = {
            'x_conv1': 1, 'x_conv2': 2, 'x_conv3': 4, 'x_conv4': 8,
        }
        return out
