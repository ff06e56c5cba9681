"""Sparse -> dense BEV projection.

PointPillarScatter (pointpillar_scatter.py:14-39): the reference loops over
the batch on host and scatters with fancy indexing; here the voxel tables
are key-sorted (ops/voxelize.py contract), so the scatter becomes the tiled
one-hot-matmul Pallas kernel in ops/scatter_tpu.py on TPU (inverse-map
gather fallback elsewhere). Padding pillars route to a spill slot whose
output is dropped.
"""

import flax.linen as nn
import jax.numpy as jnp

from ...ops.scatter_tpu import scatter_rows_sorted


class PointPillarScatter(nn.Module):
    grid_size: tuple  # (nx, ny, nz)
    num_bev_features: int

    @nn.compact
    def __call__(self, batch, training=False):
        nx, ny, nz = self.grid_size
        assert nz == 1
        feats = batch['pillar_features']  # (B, V, C)
        coords = batch['voxel_coords']  # (B, V, 3) zyx, -1 padded

        valid = coords[..., 0] >= 0
        # nz == 1, so y*nx + x ascends exactly like the sorted linear key;
        # padding rows sit at the tail and key to the ny*nx sentinel
        keys = jnp.where(valid, coords[..., 1] * nx + coords[..., 2],
                         ny * nx).astype(jnp.int32)
        canvas = scatter_rows_sorted(
            feats, keys, ny * nx,
            batch.get('bev_tile_starts'))  # (B, ny*nx, C)
        spatial = canvas.reshape(feats.shape[0], ny, nx, feats.shape[-1])
        return {**batch, 'spatial_features': spatial}


class HeightCompression(nn.Module):
    """Dense 3D feature volume -> BEV by folding depth into channels
    (height_compression.py:10-25). Input: encoded_spconv_tensor as dense
    (B, D, H, W, C) NDHWC; output (B, H, W, D*C)."""

    num_bev_features: int

    @nn.compact
    def __call__(self, batch, training=False):
        x = batch['encoded_spconv_tensor']  # (B, D, H, W, C)
        b, d, h, w, c = x.shape
        # reference reshapes (B, C, D, H, W) -> (B, C*D, H, W); NHWC analog:
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
        return {**batch, 'spatial_features': x,
                'spatial_features_stride': batch.get('encoded_spconv_tensor_stride', 8)}
