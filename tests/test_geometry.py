import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.core import geometry


def test_limit_period():
    vals = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, -0.1])
    out = geometry.limit_period(vals, offset=0.5, period=np.pi)
    assert np.all(out >= -np.pi / 2 - 1e-6)
    assert np.all(out < np.pi / 2 + 1e-6)
    # limit_period(x) == x - floor(x/pi + 0.5)*pi
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(vals) - np.floor(np.asarray(vals) / np.pi + 0.5) * np.pi,
        rtol=1e-6, atol=1e-6,
    )


def test_rotate_points_along_z_90deg():
    pts = jnp.array([[[1.0, 0.0, 2.0, 7.0]]])  # extra feature preserved
    out = geometry.rotate_points_along_z(pts, jnp.array([np.pi / 2]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.0, 1.0, 2.0, 7.0], atol=1e-6)


def test_boxes_to_corners_3d_axis_aligned():
    boxes = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 2.0, 0.0]])
    corners = np.asarray(geometry.boxes_to_corners_3d(boxes))[0]
    assert corners.shape == (8, 3)
    # corner 0 = (+dx/2, +dy/2, -dz/2) offset
    np.testing.assert_allclose(corners[0], [3.0, 3.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(corners[6], [-1.0, 1.0, 4.0], atol=1e-6)
    # top corners are bottom corners + dz
    np.testing.assert_allclose(corners[4:, 2], corners[:4, 2] + 2.0, atol=1e-6)


def test_corners_bev_matches_corners_3d():
    rng = np.random.RandomState(0)
    boxes = np.concatenate(
        [rng.randn(16, 3) * 5, rng.rand(16, 3) * 3 + 0.5, rng.randn(16, 1)], axis=1
    ).astype(np.float32)
    c3 = np.asarray(geometry.boxes_to_corners_3d(jnp.asarray(boxes)))[:, :4, :2]
    cb = np.asarray(geometry.corners_bev(jnp.asarray(boxes)))
    np.testing.assert_allclose(cb, c3, atol=1e-4)


def test_points_in_boxes_3d():
    boxes = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],
                       [10.0, 0.0, 0.0, 2.0, 2.0, 2.0, np.pi / 4]])
    pts = jnp.array([
        [0.0, 0.0, 0.0],     # inside box 0
        [0.9, 0.9, 0.0],     # inside box 0 (corner region)
        [1.5, 0.0, 0.0],     # outside
        [10.0, 1.2, 0.0],    # inside rotated box 1 (diagonal reaches sqrt(2))
        [10.9, 0.9, 0.0],    # outside rotated box 1 (corner cut off)
    ])
    inside = np.asarray(geometry.points_in_boxes_3d(pts, boxes))
    assert inside[0, 0] and inside[1, 0] and not inside[2, 0]
    assert inside[3, 1] and not inside[4, 1]
    ids = np.asarray(geometry.points_in_boxes_id(pts, boxes))
    np.testing.assert_array_equal(ids, [0, 0, -1, 1, -1])


def test_get_voxel_centers():
    coords = jnp.array([[0, 0, 0], [1, 2, 3]])  # (z, y, x)
    centers = np.asarray(
        geometry.get_voxel_centers(
            coords, downsample_times=2, voxel_size=[0.1, 0.2, 0.3],
            point_cloud_range=[0.0, -10.0, -3.0, 70.0, 10.0, 1.0],
        )
    )
    np.testing.assert_allclose(centers[0], [0.1, -9.8, -2.7], atol=1e-5)
    np.testing.assert_allclose(centers[1], [0.1 * 2 * 3.5, -10 + 0.4 * 2.5, -3 + 0.6 * 1.5], atol=1e-5)
