"""Core box/point geometry in JAX.

Vectorized, static-shape re-implementations of the reference geometry:
  * rotate_points_along_z / limit_period  (pcdet/utils/common_utils.py:52-95)
  * boxes_to_corners_3d / enlarge_box3d   (pcdet/utils/box_utils.py:27-53,136)
  * get_voxel_centers                     (pcdet/utils/common_utils.py:97-113)
  * points_in_boxes (replaces the roiaware_pool3d CUDA `points_in_boxes_gpu`
    kernel, pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:313) as a
    dense broadcast test — on TPU an O(N·M) vectorized test maps onto the VPU
    far better than the reference's thread-per-point scatter kernel.

All functions are shape-polymorphic in the leading batch dims and safe under
jit/vmap/grad.
"""

import jax.numpy as jnp
import numpy as np

# Corner ordering matches box_utils.boxes_to_corners_3d (box_utils.py:27-53):
# bottom face 0-3 (z = -dz/2), top face 4-7; corner k+4 is above corner k.
CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def limit_period(val, offset=0.5, period=jnp.pi):
    """Wrap angle into [-offset*period, (1-offset)*period) (common_utils.py:52)."""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., 3, 3) rotation about +z by `angle` (...,)."""
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    )
    return rot.reshape(angle.shape + (3, 3))


def rotate_points_along_z(points, angle):
    """Rotate points around z.

    Args:
        points: (B, N, 3 + C)
        angle: (B,) radians, counter-clockwise about +z
    Returns:
        (B, N, 3 + C)
    Mirrors common_utils.rotate_points_along_z (common_utils.py:66-81).
    """
    # elementwise rotation, NOT einsum/matmul: a dot lowers to the MXU
    # whose default operand precision is bf16 on TPU — rotating absolute
    # coordinates (|x| up to ~70 m) would lose ~0.2-0.3 m, poisoning the
    # RoI canonical transforms and corner losses that route through here.
    # The VPU form is exact f32 and avoids an MXU trip for a 2-wide dot.
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    x, y = points[..., 0], points[..., 1]
    xyz = jnp.stack([x * c - y * s, x * s + y * c, points[..., 2]], axis=-1)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """(N, 7)[x,y,z,dx,dy,dz,heading] -> (N, 8, 3) corners.

    Same corner ordering as box_utils.boxes_to_corners_3d (box_utils.py:27).
    """
    template = jnp.asarray(CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def corners_bev(boxes):
    """(..., 5+)[x,y,...,dx,dy,...,heading order (N,7)] -> (N, 4, 2) BEV corners.

    Corner order: (+x+y, +x-y, -x-y, -x+y) in the box frame — the bottom face
    of `boxes_to_corners_3d` projected to BEV.
    """
    template = jnp.asarray(CORNER_TEMPLATE[:4, :2], dtype=boxes.dtype)  # (4, 2)
    dxy = boxes[..., None, 3:5] * template  # (..., 4, 2)
    cosa = jnp.cos(boxes[..., 6])[..., None]
    sina = jnp.sin(boxes[..., 6])[..., None]
    x = dxy[..., 0] * cosa - dxy[..., 1] * sina
    y = dxy[..., 0] * sina + dxy[..., 1] * cosa
    return jnp.stack([x, y], axis=-1) + boxes[..., None, 0:2]


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    """Grow (dx, dy, dz) by extra_width, center fixed (box_utils.py:136-149)."""
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return boxes3d.at[..., 3:6].add(extra)


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel integer coords (N, 3)[z,y,x order] -> metric centers (N, 3)[x,y,z].

    Mirrors common_utils.get_voxel_centers (common_utils.py:97-113).
    """
    coords = voxel_coords[:, ::-1].astype(jnp.float32)  # -> (x, y, z)
    voxel_size = jnp.asarray(voxel_size, dtype=jnp.float32) * downsample_times
    pc_range = jnp.asarray(point_cloud_range[0:3], dtype=jnp.float32)
    return (coords + 0.5) * voxel_size + pc_range


def points_in_boxes_3d(points, boxes):
    """Dense point-in-rotated-box test.

    Args:
        points: (N, 3)
        boxes: (M, 7) [x, y, z, dx, dy, dz, heading] (center z)
    Returns:
        (N, M) bool — point n inside box m.

    Replaces roiaware points_in_boxes (check_pt_in_box3d semantics,
    roiaware_pool3d_kernel.cu:21-37: local z in [-dz/2, dz/2], |local x| <
    dx/2, |local y| < dy/2 after rotating by -heading).
    """
    shift = points[:, None, :] - boxes[None, :, 0:3]  # (N, M, 3)
    cosa = jnp.cos(-boxes[:, 6])
    sina = jnp.sin(-boxes[:, 6])
    local_x = shift[..., 0] * cosa[None, :] - shift[..., 1] * sina[None, :]
    local_y = shift[..., 0] * sina[None, :] + shift[..., 1] * cosa[None, :]
    in_x = jnp.abs(local_x) < boxes[None, :, 3] / 2
    in_y = jnp.abs(local_y) < boxes[None, :, 4] / 2
    in_z = jnp.abs(shift[..., 2]) <= boxes[None, :, 5] / 2
    return in_x & in_y & in_z


def points_in_boxes_id(points, boxes, box_valid_mask=None):
    """For each point, index of the first box containing it, else -1.

    Matches the assignment convention of points_in_boxes_gpu
    (roiaware_pool3d_kernel.cu:313-334: each point gets one box id).
    Args:
        points: (N, 3); boxes: (M, 7(+C)); box_valid_mask: (M,) optional bool.
    Returns:
        (N,) int32 box index in [-1, M).
    """
    inside = points_in_boxes_3d(points, boxes[:, :7])  # (N, M)
    if box_valid_mask is not None:
        inside = inside & box_valid_mask[None, :]
    any_inside = inside.any(axis=1)
    first = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return jnp.where(any_inside, first, -1)
