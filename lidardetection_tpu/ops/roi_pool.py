"""RoI point pooling ops.

Replaces the reference's roiaware_pool3d and roipoint_pool3d CUDA extensions
(pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu,
pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu) with vectorized
masked gathers/scatters over fixed capacities.
"""

import jax
import jax.numpy as jnp

from ..core.geometry import points_in_boxes_3d


def roipoint_pool3d(points, point_features, point_num, rois, roi_valid,
                    num_sampled_points=512):
    """Sample a fixed number of in-RoI points per box.

    Mirrors roipool3d (roipoint_pool3d_kernel.cu:38-130): first
    `num_sampled_points` points inside each (enlarged) RoI in index order;
    boxes with fewer points repeat the first found (the CUDA kernel
    duplicates via modulo); empty boxes flagged.

    Args:
        points: (B, N, 3); point_features: (B, N, C); point_num: (B,);
        rois: (B, R, 7+); roi_valid: (B, R) bool.
    Returns:
        pooled (B, R, S, 3 + C), empty_flag (B, R) bool.
    """
    s = num_sampled_points

    def one(pts, feats, n, boxes, bvalid):
        nn = pts.shape[0]
        pvalid = jnp.arange(nn) < n
        inside = points_in_boxes_3d(pts, boxes[:, :7])  # (N, R)
        inside = inside & pvalid[:, None] & bvalid[None, :]
        inside = inside.T  # (R, N)
        # first `s` in-RoI points in index order via row-wise top_k of
        # (-col where inside) — scatter-free (XLA:TPU scatters serialize)
        score = jnp.where(inside,
                          -jnp.arange(nn, dtype=jnp.float32)[None, :],
                          -jnp.inf)
        top, _ = jax.lax.top_k(score, min(s, nn))  # (R, <=s) descending
        if nn < s:  # fewer points than sample slots: pad with misses
            top = jnp.pad(top, ((0, 0), (0, s - nn)),
                          constant_values=-jnp.inf)
        hit = jnp.isfinite(top)
        idx = jnp.where(hit, (-top).astype(jnp.int32), 0)
        cnt = hit.sum(axis=1)
        empty = cnt <= 0
        # repeat pattern: slot k >= cnt takes slot k % cnt (cuda modulo dup)
        k = jnp.arange(s)[None, :]
        safe_cnt = jnp.maximum(cnt, 1)[:, None]
        src_slot = jnp.where(k < safe_cnt, k, k % safe_cnt)
        idx = jnp.take_along_axis(idx, src_slot, axis=1)
        data = jnp.concatenate([pts, feats], axis=-1)  # (N, 3+C)
        pooled = data[idx]  # (R, S, 3+C)
        pooled = jnp.where(empty[:, None, None], 0.0, pooled)
        return pooled, empty

    return jax.vmap(one)(points, point_features, point_num, rois, roi_valid)


def roi_point_sample(points, point_num, rois, roi_valid, cap):
    """First `cap` in-box points per RoI, in index order.

    The shared sampling stage for RoI pooling: the (R, N) membership test
    runs ONCE and the expensive per-point work downstream runs over R*cap
    rows instead of R*N (XLA:TPU scatters serialize per row — pooling via
    a direct (R, N)-row scatter cost ~600 ms/batch at Part-A2 shapes).

    Args:
        points (B, N, 3); point_num (B,); rois (B, R, 7+);
        roi_valid (B, R); cap: static int.
    Returns:
        idx (B, R, cap) int32 point indices (ascending; 0-filled past the
        hit count), hit (B, R, cap) bool.
    """

    def one(pts, n, boxes, bvalid):
        nn = pts.shape[0]
        pvalid = jnp.arange(nn) < n
        inside = points_in_boxes_3d(pts, boxes[:, :7])  # (N, R)
        inside = inside.T & pvalid[None, :] & bvalid[:, None]  # (R, N)
        score = jnp.where(inside,
                          -jnp.arange(nn, dtype=jnp.float32)[None, :],
                          -jnp.inf)
        top, _ = jax.lax.top_k(score, min(cap, nn))
        if nn < cap:
            top = jnp.pad(top, ((0, 0), (0, cap - nn)),
                          constant_values=-jnp.inf)
        hit = jnp.isfinite(top)
        return jnp.where(hit, (-top).astype(jnp.int32), 0), hit

    return jax.vmap(one)(points, point_num, rois, roi_valid)


def roiaware_pool3d(points, point_features, point_num, rois, roi_valid,
                    out_size=(14, 14, 14), pool_method='max',
                    sample_cap=1024, sample=None):
    """RoI-aware voxel-grid pooling (roiaware_pool3d_kernel.cu:111-235).

    Each RoI is divided into an out_x*out_y*out_z local grid; point features
    reduce into their cell with max (or mean).

    TPU shape: a two-stage gather-then-scatter. Stage 1 samples the first
    `sample_cap` in-box points per RoI (`roi_point_sample`); stage 2
    scatters only those R*cap rows into the per-RoI grids — ~30x fewer
    serialized scatter rows than the direct (R, N) formulation at Part-A2
    shapes (N=16k, R=128). Exact vs the reference whenever every RoI holds
    <= sample_cap points (the reference's own cap is 128 *per cell*,
    roiaware_pool3d_kernel.cu:39 — same drop-the-excess class); pass
    `sample` to reuse one sampling across several pools of the same RoIs.

    Args:
        points (B, N, 3); point_features (B, N, C); point_num (B,);
        rois (B, R, 7); roi_valid (B, R); sample: optional (idx, hit) from
        `roi_point_sample(points, point_num, rois, roi_valid, sample_cap)`.
    Returns:
        (B, R, out_x, out_y, out_z, C)
    """
    ox, oy, oz = out_size
    ncell = ox * oy * oz
    if sample is None:
        sample = roi_point_sample(points, point_num, rois, roi_valid,
                                  sample_cap)
    idx, hit = sample
    s = idx.shape[-1]

    def one(pts, feats, boxes, idx, hit):
        r = boxes.shape[0]
        c = feats.shape[-1]
        data = jnp.concatenate([pts, feats], axis=-1)  # (N, 3+C)
        grp = data[idx.reshape(-1)].reshape(r, s, 3 + c)
        spts, sfeats = grp[..., :3], grp[..., 3:]
        # local coords per (roi, sampled point)
        shift = spts - boxes[:, None, 0:3]  # (R, S, 3)
        cosa = jnp.cos(-boxes[:, 6])[:, None]
        sina = jnp.sin(-boxes[:, 6])[:, None]
        lx = shift[..., 0] * cosa - shift[..., 1] * sina
        ly = shift[..., 0] * sina + shift[..., 1] * cosa
        lz = shift[..., 2] + boxes[:, None, 5] / 2  # z from box bottom
        dx, dy, dz = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
        cx = jnp.clip(((lx + dx / 2) / jnp.maximum(dx / ox, 1e-9)
                       ).astype(jnp.int32), 0, ox - 1)
        cy = jnp.clip(((ly + dy / 2) / jnp.maximum(dy / oy, 1e-9)
                       ).astype(jnp.int32), 0, oy - 1)
        cz = jnp.clip((lz / jnp.maximum(dz / oz, 1e-9)
                       ).astype(jnp.int32), 0, oz - 1)
        cell = (cx * oy + cy) * oz + cz  # (R, S)
        flat = jnp.where(hit, jnp.arange(r)[:, None] * ncell + cell,
                         r * ncell)
        if pool_method == 'max':
            canvas = jnp.full((r * ncell + 1, c), -jnp.inf, feats.dtype)
            canvas = canvas.at[flat.reshape(-1)].max(
                sfeats.reshape(-1, c))
            canvas = canvas[:-1]
            canvas = jnp.where(jnp.isinf(canvas), 0.0, canvas)
        else:
            ssum = jnp.zeros((r * ncell + 1, c), feats.dtype)
            ssum = ssum.at[flat.reshape(-1)].add(sfeats.reshape(-1, c))
            cnt = jnp.zeros((r * ncell + 1, 1), feats.dtype)
            cnt = cnt.at[flat.reshape(-1)].add(
                hit.reshape(-1, 1).astype(feats.dtype))
            canvas = (ssum / jnp.clip(cnt, 1.0, None))[:-1]
        return canvas.reshape(r, ox, oy, oz, c)

    return jax.vmap(one)(points, point_features, rois, idx, hit)
