"""Sparse UNet (UNetV2) for Part-A².

Re-expresses pcdet/models/backbones_3d/spconv_unet.py:49-211: the
VoxelBackBone8x encoder plus a decoder of UR blocks — lateral
SparseBasicBlock, concat with bottom-up features, channel-reduction residual,
inverse conv back to the previous stage's coordinates. The reference reuses
spconv rulebooks via indice_key; here each stage's SparseTensor and the
downsample geometry are kept so the decoder builds the exact inverse
rulebooks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.geometry import get_voxel_centers
from ...ops import sparse
from .spconv_backbone import SparseBasicBlock, SparseConvLayer, _stage_capacity


class UNetV2(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    voxel_size: tuple
    point_cloud_range: tuple
    axis_name: str | None = None
    dtype: object = None

    @property
    def num_point_features(self):
        return 16

    @nn.compact
    def __call__(self, batch, training=False):
        nx, ny, nz = self.grid_size
        spatial_shape = (nz + 1, ny, nx)
        feats = batch['voxel_features']
        coords = batch['voxel_coords']
        cap = feats.shape[1]
        ax, dt = self.axis_name, self.dtype

        host = 'rb_subm1' in batch  # host-built rulebooks (ops/sparse_plan.py)
        if host:
            st = sparse.SparseTensor(feats, coords, batch['num_voxels'],
                                     spatial_shape)
        else:
            st = sparse.from_unsorted(feats, coords, batch['num_voxels'],
                                      spatial_shape)

        def subm(st, channels, n_layers, name, first_plain=False):
            rule = (batch[f'rb_{name}'] if host
                    else sparse.build_subm_rulebook(st, (3, 3, 3)))
            vm = st.valid_mask
            f = st.features
            if first_plain:
                f = SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                    dtype=dt)(f, vm, rule, training)
            for _ in range(n_layers):
                f = SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                    dtype=dt)(f, vm, rule, training)
            return st._replace(features=f), rule

        def down(st, channels, stride, padding, kernel, capacity, name):
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
            rb_bwd = batch.get(f'rb_{name}_bwd') if host else None
            f = SparseConvLayer(channels, rule.shape[-1], axis_name=ax,
                                dtype=dt)(st.features, vm, rule, training,
                                          rb_bwd=rb_bwd,
                                          in_valid=st.valid_mask)
            geom = (kernel, stride, padding)
            return sparse.SparseTensor(f, out_coords, out_num, out_shape), geom

        # ---- encoder (mirrors VoxelBackBone8x / spconv_unet.py:64-106) ----
        st, rule1 = subm(st, 16, 1, 'subm1', first_plain=True)
        x_conv1 = st
        st2, geom2 = down(st, 32, (2, 2, 2), (1, 1, 1), (3, 3, 3),
                          _stage_capacity(self.model_cfg, 0, cap), 'down2')
        st2, rule2 = subm(st2, 32, 2, 'subm2')
        x_conv2 = st2
        st3, geom3 = down(st2, 64, (2, 2, 2), (1, 1, 1), (3, 3, 3),
                          _stage_capacity(self.model_cfg, 1, cap), 'down3')
        st3, rule3 = subm(st3, 64, 2, 'subm3')
        x_conv3 = st3
        st4, geom4 = down(st3, 64, (2, 2, 2), (0, 1, 1), (3, 3, 3),
                          _stage_capacity(self.model_cfg, 2, cap), 'down4')
        st4, rule4 = subm(st4, 64, 2, 'subm4')
        x_conv4 = st4

        out = dict(batch)
        if self.model_cfg.get('RETURN_ENCODED_TENSOR', True):
            last_pad = self.model_cfg.get('last_pad', 0)
            st_out, _ = down(st4, 128, (2, 1, 1),
                             (last_pad, last_pad, last_pad), (3, 1, 1),
                             _stage_capacity(self.model_cfg, 3, cap), 'out')
            out['encoded_spconv_tensor'] = sparse.sparse_to_dense(st_out)
            out['encoded_spconv_tensor_stride'] = 8

        # ---- decoder (UR_block_forward, spconv_unet.py:134-143) ----
        def ur_block(lateral, lateral_rule, bottom_feats, channels,
                     up_st=None, geom=None, inv_out=None, inv_name=None,
                     last=False):
            """x_lateral/bottom at the same coords; inverse conv lifts to
            up_st's coords (or a subm conv5 when last)."""
            vm = lateral.valid_mask
            x_trans = SparseBasicBlock(lateral.features.shape[-1],
                                       axis_name=ax, dtype=dt)(
                lateral.features, vm, lateral_rule, training)
            x_cat = jnp.concatenate([bottom_feats, x_trans], axis=-1)
            x_m = SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                  dtype=dt)(x_cat, vm, lateral_rule, training)
            # channel_reduction (spconv_unet.py:145-159): fold 2C -> C by sum
            n, c_in = x_cat.shape[1], x_cat.shape[-1]
            red = x_cat.reshape(x_cat.shape[0], n, channels, -1).sum(-1)
            x = x_m + red.astype(x_m.dtype)
            if last:
                return SparseConvLayer(channels, 27, subm=True, axis_name=ax,
                                       dtype=dt)(x, vm, lateral_rule,
                                                 training)
            if host:
                inv_rule = batch[f'rb_{inv_name}']
            else:
                kernel, stride, padding = geom
                inv_rule = sparse.build_inverse_rulebook(
                    lateral._replace(features=x), up_st.coords,
                    up_st.spatial_shape, kernel, stride, padding)
            # grad of an inverse conv flows up->down through the PAIRED
            # down op's forward rulebook (same offset enumeration)
            down_name = inv_name.replace('inv', 'down')
            rb_bwd = batch.get(f'rb_{down_name}') if host else None
            return SparseConvLayer(inv_out, inv_rule.shape[-1], axis_name=ax,
                                   dtype=dt)(x, up_st.valid_mask, inv_rule,
                                             training, rb_bwd=rb_bwd,
                                             in_valid=vm)

        # decoder channel plan (spconv_unet.py:110-131):
        # inv4: 64->64, inv3: 64->32, inv2: 32->16, final conv5: 16->16
        x_up4 = ur_block(x_conv4, rule4, x_conv4.features, 64,
                         up_st=x_conv3, geom=geom4, inv_out=64,
                         inv_name='inv4')
        x_up3 = ur_block(x_conv3, rule3, x_up4, 64, up_st=x_conv2,
                         geom=geom3, inv_out=32, inv_name='inv3')
        x_up2 = ur_block(x_conv2, rule2, x_up3, 32, up_st=x_conv1,
                         geom=geom2, inv_out=16, inv_name='inv2')
        x_up1 = ur_block(x_conv1, rule1, x_up2, 16, last=True)

        centers = jax.vmap(lambda c: get_voxel_centers(
            c, 1, self.voxel_size, self.point_cloud_range))(x_conv1.coords)

        out['point_features'] = x_up1.astype(jnp.float32)  # (B, V, 16)
        out['point_coords'] = centers  # (B, V, 3)
        out['point_valid'] = x_conv1.valid_mask
        out['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        return out
