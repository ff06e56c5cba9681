"""Fixed-capacity hard voxelization.

Replaces the external spconv ``VoxelGenerator`` the reference calls from
pcdet/datasets/processor/data_processor.py:48-81. Semantics reproduced:

  * grid_size = round((pc_range[3:6] - pc_range[0:3]) / voxel_size)
    (data_processor.py:62-64)
  * each point maps to an integer voxel (x, y, z) cell; at most
    ``max_points_per_voxel`` points are kept per voxel (first-come order) and
    at most ``max_voxels`` voxels are kept (first-come order);
  * returned coords are (z, y, x) like spconv's, so everything downstream
    (HeightCompression, PointPillarScatter) indexes identically.

Two implementations:
  * `voxelize_np` — host-side numpy, used by the input pipeline (the
    reference voxelizes on CPU workers too). O(N) hash-free bucketing.
  * `voxelize_jax` — on-device version built from sort/segment primitives so
    it can live inside a jitted step (e.g. streaming inference where points
    arrive on device). Deterministic: ties broken by point index.

Both produce static shapes: (max_voxels, max_points, C) + coords + counts,
padded with zeros, plus num_voxels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def grid_size_from_range(point_cloud_range, voxel_size):
    pc_range = np.asarray(point_cloud_range, dtype=np.float64)
    vsz = np.asarray(voxel_size, dtype=np.float64)
    grid = (pc_range[3:6] - pc_range[0:3]) / vsz
    return np.round(grid).astype(np.int64)  # (nx, ny, nz)


def voxelize_np(points, point_cloud_range, voxel_size, max_points_per_voxel,
                max_voxels, sort_rows=True):
    """Host-side hard voxelizer.

    Args:
        points: (N, C) float array, C >= 3 (x, y, z, features...).
        sort_rows: return the voxel table in ascending linear-key order
            ((z*gy + y)*gx + x)) — the framework-wide sorted-table contract
            consumed by the TPU scatter kernels (searchsorted tile ranges).
            Voxel membership and first-come per-voxel point order are
            unaffected. spconv's VoxelGenerator emits first-come row order
            instead; nothing downstream depends on row order, so this is a
            free degree of freedom.
    Returns:
        voxels: (max_voxels, max_points_per_voxel, C) float32
        coords: (max_voxels, 3) int32 in (z, y, x) order, padded with -1
        num_points_per_voxel: (max_voxels,) int32
        num_voxels: int
    """
    points = np.asarray(points, dtype=np.float32)
    from ..native import voxelize_native
    native = voxelize_native(points, point_cloud_range, voxel_size,
                             max_points_per_voxel, max_voxels,
                             sort_rows=sort_rows)
    if native is not None:
        return native
    pc_range = np.asarray(point_cloud_range, dtype=np.float32)
    vsz = np.asarray(voxel_size, dtype=np.float32)
    grid = grid_size_from_range(point_cloud_range, voxel_size)  # (nx, ny, nz)

    coords_f = (points[:, 0:3] - pc_range[0:3]) / vsz
    coords_xyz = np.floor(coords_f).astype(np.int64)
    in_range = np.all((coords_xyz >= 0) & (coords_xyz < grid), axis=1)

    voxels = np.zeros((max_voxels, max_points_per_voxel, points.shape[1]), dtype=np.float32)
    coords_out = np.full((max_voxels, 3), -1, dtype=np.int32)
    num_points = np.zeros((max_voxels,), dtype=np.int32)

    keys = (coords_xyz[:, 2] * grid[1] + coords_xyz[:, 1]) * grid[0] + coords_xyz[:, 0]
    voxel_slot = {}
    n_vox = 0
    idxs = np.nonzero(in_range)[0]
    for i in idxs:
        k = keys[i]
        slot = voxel_slot.get(k, -1)
        if slot < 0:
            if n_vox >= max_voxels:
                continue
            slot = n_vox
            voxel_slot[k] = slot
            coords_out[slot] = (coords_xyz[i, 2], coords_xyz[i, 1], coords_xyz[i, 0])
            n_vox += 1
        c = num_points[slot]
        if c < max_points_per_voxel:
            voxels[slot, c] = points[i]
            num_points[slot] = c + 1
    if sort_rows and n_vox > 1:
        zyx = coords_out[:n_vox].astype(np.int64)
        key = (zyx[:, 0] * grid[1] + zyx[:, 1]) * grid[0] + zyx[:, 2]
        order = np.argsort(key, kind='stable')
        voxels[:n_vox] = voxels[order]
        coords_out[:n_vox] = coords_out[order]
        num_points[:n_vox] = num_points[order]
    return voxels, coords_out, num_points, n_vox


@functools.partial(
    jax.jit,
    static_argnames=('point_cloud_range', 'voxel_size', 'max_points_per_voxel', 'max_voxels'),
)
def voxelize_jax(points, num_valid_points, point_cloud_range, voxel_size,
                 max_points_per_voxel, max_voxels):
    """On-device hard voxelizer (static shapes, jit-safe).

    Args:
        points: (N, C) padded point array.
        num_valid_points: scalar int — leading valid count.
        point_cloud_range / voxel_size: python tuples (static).
    Returns:
        voxels (max_voxels, P, C), coords (max_voxels, 3) zyx int32 (-1 pad),
        num_points_per_voxel (max_voxels,) int32, num_voxels scalar int32.

    Algorithm (all O(N log N), XLA-friendly):
      1. linear voxel key per point (out-of-range / padded -> sentinel);
      2. stable sort by key — groups co-voxel points, preserves point order
         (matching the first-come semantics of spconv's VoxelGenerator);
      3. segment boundaries -> voxel ids via cumsum; rank within segment via
         arange - segment_start;
      4. scatter points into (max_voxels, P) table; drop overflow.

    Note: voxel *slots* are assigned in key order (not first-point-arrival
    order like VoxelGenerator), so when more than max_voxels voxels exist the
    dropped set differs from the reference; per-voxel point selection matches
    exactly (stable sort preserves arrival order within a voxel). Training
    shuffles points anyway (data_processor.py:36-46), so this is immaterial.
    """
    n = points.shape[0]
    pc_range = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsz = jnp.asarray(voxel_size, dtype=points.dtype)
    grid = grid_size_from_range(point_cloud_range, voxel_size)  # numpy (nx, ny, nz)
    gx, gy, gz = int(grid[0]), int(grid[1]), int(grid[2])

    coords_xyz = jnp.floor((points[:, 0:3] - pc_range[0:3]) / vsz).astype(jnp.int32)
    valid = (
        (jnp.arange(n) < num_valid_points)
        & jnp.all(coords_xyz >= 0, axis=1)
        & (coords_xyz[:, 0] < gx) & (coords_xyz[:, 1] < gy) & (coords_xyz[:, 2] < gz)
    )
    sentinel = gx * gy * gz  # sorts after every real key
    key = (coords_xyz[:, 2] * gy + coords_xyz[:, 1]) * gx + coords_xyz[:, 0]
    key = jnp.where(valid, key, sentinel)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    spoints = points[order]
    svalid = skey < sentinel

    is_new = svalid & jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    voxel_id = jnp.cumsum(is_new) - 1  # per sorted point; -1 for leading invalid (none: invalid sort last)
    num_voxels_total = jnp.sum(is_new)

    # rank of each point inside its voxel
    seg_start = jnp.where(is_new, jnp.arange(n), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(n) - seg_start

    keep = svalid & (voxel_id < max_voxels) & (rank < max_points_per_voxel)
    # scatter into fixed table with a spill row
    vid = jnp.where(keep, voxel_id, max_voxels)
    rid = jnp.where(keep, rank, 0)
    voxels = jnp.zeros((max_voxels + 1, max_points_per_voxel, points.shape[1]), dtype=points.dtype)
    voxels = voxels.at[vid, rid].set(jnp.where(keep[:, None], spoints, 0.0))[:max_voxels]

    counts = jnp.zeros((max_voxels + 1,), dtype=jnp.int32).at[vid].add(
        keep.astype(jnp.int32))[:max_voxels]

    first_mask = keep & (rank == 0)
    vid_first = jnp.where(first_mask, voxel_id, max_voxels)
    coords_zyx = jnp.stack([coords_xyz[order][:, 2], coords_xyz[order][:, 1],
                            coords_xyz[order][:, 0]], axis=1).astype(jnp.int32)
    coords = jnp.full((max_voxels + 1, 3), -1, dtype=jnp.int32)
    coords = coords.at[vid_first].set(coords_zyx)[:max_voxels]

    num_voxels = jnp.minimum(num_voxels_total, max_voxels).astype(jnp.int32)
    return voxels, coords, counts, num_voxels
