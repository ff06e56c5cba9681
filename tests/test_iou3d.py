import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.core import iou3d


def _box(x, y, dx, dy, heading, z=0.0, dz=2.0):
    return [x, y, z, dx, dy, dz, heading]


def mc_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo BEV overlap estimate for verification."""
    rng = np.random.RandomState(seed)
    ax, ay, _, adx, ady, _, ar = box_a
    pts = rng.rand(n, 2) - 0.5
    pts = pts * [adx, ady]
    ca, sa = np.cos(ar), np.sin(ar)
    world = np.stack([pts[:, 0] * ca - pts[:, 1] * sa + ax,
                      pts[:, 0] * sa + pts[:, 1] * ca + ay], axis=1)
    bx, by, _, bdx, bdy, _, br = box_b
    rel = world - [bx, by]
    cb, sb = np.cos(-br), np.sin(-br)
    local = np.stack([rel[:, 0] * cb - rel[:, 1] * sb,
                      rel[:, 0] * sb + rel[:, 1] * cb], axis=1)
    inside = (np.abs(local[:, 0]) < bdx / 2) & (np.abs(local[:, 1]) < bdy / 2)
    return inside.mean() * adx * ady


def test_identical_boxes_iou_one():
    b = jnp.array([_box(1.0, 2.0, 4.0, 2.0, 0.3)])
    iou = np.asarray(iou3d.boxes_iou_bev(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)


def test_disjoint_boxes_iou_zero():
    a = jnp.array([_box(0.0, 0.0, 2.0, 2.0, 0.5)])
    b = jnp.array([_box(100.0, 0.0, 2.0, 2.0, 1.2)])
    np.testing.assert_allclose(np.asarray(iou3d.boxes_iou_bev(a, b)), [[0.0]], atol=1e-6)


def test_axis_aligned_overlap():
    a = jnp.array([_box(0.0, 0.0, 2.0, 2.0, 0.0)])
    b = jnp.array([_box(1.0, 1.0, 2.0, 2.0, 0.0)])
    ov = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(ov, [[1.0]], atol=1e-4)  # 1x1 overlap square
    iou = np.asarray(iou3d.boxes_iou_bev(a, b))
    np.testing.assert_allclose(iou, [[1.0 / 7.0]], atol=1e-4)


def test_rotated_45_square_octagon():
    # unit-area analysis: side-2 square vs same square rotated 45 deg
    # intersection is a regular octagon with area 8*(sqrt(2)-1)
    a = jnp.array([_box(0.0, 0.0, 2.0, 2.0, 0.0)])
    b = jnp.array([_box(0.0, 0.0, 2.0, 2.0, np.pi / 4)])
    ov = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(ov, [[8 * (np.sqrt(2) - 1)]], rtol=1e-3)


def test_contained_box():
    a = jnp.array([_box(0.0, 0.0, 4.0, 4.0, 0.7)])
    b = jnp.array([_box(0.0, 0.0, 1.0, 1.0, 1.9)])
    ov = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(ov, [[1.0]], rtol=1e-3)


def test_random_boxes_vs_monte_carlo():
    rng = np.random.RandomState(42)
    boxes_a, boxes_b = [], []
    for _ in range(12):
        boxes_a.append(_box(rng.randn() * 2, rng.randn() * 2,
                            rng.rand() * 3 + 0.5, rng.rand() * 3 + 0.5,
                            rng.rand() * 2 * np.pi))
        boxes_b.append(_box(rng.randn() * 2, rng.randn() * 2,
                            rng.rand() * 3 + 0.5, rng.rand() * 3 + 0.5,
                            rng.rand() * 2 * np.pi))
    ov = np.asarray(iou3d.boxes_overlap_bev(jnp.array(boxes_a), jnp.array(boxes_b)))
    for i in range(12):
        est = mc_overlap(boxes_a[i], boxes_b[i], seed=i)
        assert abs(ov[i, i] - est) < 0.03, (i, ov[i, i], est)


def test_iou3d_z_overlap():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])  # half z overlap
    iou = np.asarray(iou3d.boxes_iou3d(a, b))
    np.testing.assert_allclose(iou, [[4.0 / 12.0]], atol=1e-4)


def test_nearest_bev_iou():
    a = jnp.array([_box(0.0, 0.0, 2.0, 4.0, 0.0)])
    b = jnp.array([_box(0.0, 0.0, 2.0, 4.0, np.pi / 2)])
    iou = np.asarray(iou3d.boxes3d_nearest_bev_iou(a, b))
    # b's world footprint after 90 deg rotation is (4, 2); overlap with the
    # (2, 4) box is 2x2=4, union 12 -> exactly 1/3 (the aligned approximation
    # is exact at multiples of 90 deg).
    np.testing.assert_allclose(iou, [[1.0 / 3.0]], atol=1e-5)
    # same heading -> identical boxes
    same = np.asarray(iou3d.boxes3d_nearest_bev_iou(a, a))
    np.testing.assert_allclose(same, [[1.0]], atol=1e-5)


def test_nms_greedy_semantics():
    boxes = jnp.array([
        _box(0.0, 0.0, 2.0, 2.0, 0.0),    # score .9  keep
        _box(0.5, 0.0, 2.0, 2.0, 0.0),    # score .8  iou with 0 = 1.5*2/(8-3) = .43 > .1 -> suppressed
        _box(10.0, 0.0, 2.0, 2.0, 0.0),   # score .7  keep
        _box(10.2, 0.0, 2.0, 2.0, 0.0),   # score .6  suppressed by 2
        _box(-10.0, 0.0, 2.0, 2.0, 0.0),  # score .5  keep
    ])
    scores = jnp.array([0.9, 0.8, 0.7, 0.6, 0.5])
    idx, mask, num = iou3d.nms_bev(boxes, scores, thresh=0.1, pre_maxsize=5, post_maxsize=4)
    assert int(num) == 3
    np.testing.assert_array_equal(np.asarray(idx)[:3], [0, 2, 4])
    np.testing.assert_array_equal(np.asarray(mask), [True, True, True, False])


def test_nms_valid_mask_and_post_max():
    boxes = jnp.array([_box(float(i * 10), 0.0, 2.0, 2.0, 0.0) for i in range(6)])
    scores = jnp.array([0.9, 0.8, 0.7, 0.6, 0.5, 0.4])
    valid = jnp.array([True, False, True, True, True, True])
    idx, mask, num = iou3d.nms_bev(boxes, scores, 0.1, pre_maxsize=6, post_maxsize=3, valid_mask=valid)
    assert int(num) == 3  # capped by post_maxsize
    np.testing.assert_array_equal(np.asarray(idx), [0, 2, 3])
