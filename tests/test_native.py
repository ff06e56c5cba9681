"""Native (C++/ctypes) host kernels vs their numpy twins."""

import numpy as np
import pytest

from lidardetection_tpu import native
from lidardetection_tpu.core import np_geometry
from lidardetection_tpu.ops.voxelize import voxelize_np

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason='native lib unavailable (no g++?)')


def _numpy_voxelize(monkeypatch, *args):
    monkeypatch.setattr(native, 'voxelize_native', lambda *a, **k: None)
    return voxelize_np(*args)


def test_voxelize_matches_numpy(monkeypatch):
    rng = np.random.RandomState(0)
    points = np.c_[rng.uniform(-5, 75, (20000, 1)),
                   rng.uniform(-45, 45, (20000, 1)),
                   rng.uniform(-4, 3, (20000, 1)),
                   rng.rand(20000, 1)].astype(np.float32)
    pc_range = (0, -39.68, -3, 69.12, 39.68, 1)
    vsz = (0.16, 0.16, 4)
    nat = native.voxelize_native(points, pc_range, vsz, 32, 16000)
    ref = _numpy_voxelize(monkeypatch, points, pc_range, vsz, 32, 16000)
    assert nat[3] == ref[3]
    np.testing.assert_array_equal(nat[1], ref[1])  # coords incl. order
    np.testing.assert_array_equal(nat[2], ref[2])  # counts
    np.testing.assert_array_equal(nat[0], ref[0])  # first-come point order


def test_voxelize_overflow_semantics(monkeypatch):
    """max_voxels overflow keeps first-come voxels; later points still
    accumulate into already-created voxels."""
    rng = np.random.RandomState(1)
    points = np.c_[rng.uniform(0, 69, (5000, 1)),
                   rng.uniform(-39, 39, (5000, 1)),
                   rng.uniform(-3, 1, (5000, 1))].astype(np.float32)
    pc_range = (0, -39.68, -3, 69.12, 39.68, 1)
    vsz = (0.64, 0.64, 4)
    nat = native.voxelize_native(points, pc_range, vsz, 4, 100)
    ref = _numpy_voxelize(monkeypatch, points, pc_range, vsz, 4, 100)
    assert nat[3] == ref[3] == 100
    np.testing.assert_array_equal(nat[1], ref[1])
    np.testing.assert_array_equal(nat[2], ref[2])
    np.testing.assert_array_equal(nat[0], ref[0])


def test_rotated_iou_matches_numpy():
    rng = np.random.RandomState(2)
    n, m = 40, 60
    def boxes(k):
        return np.c_[rng.uniform(-20, 20, (k, 2)), rng.uniform(-1, 1, (k, 1)),
                     rng.uniform(1, 6, (k, 2)), rng.uniform(1, 2, (k, 1)),
                     rng.uniform(-np.pi, np.pi, (k, 1))].astype(np.float32)
    a, b = boxes(n), boxes(m)
    nat = native.rotated_iou_bev_native(a[:, [0, 1, 3, 4, 6]],
                                        b[:, [0, 1, 3, 4, 6]])
    ca, cb = np_geometry.corners_bev(a), np_geometry.corners_bev(b)
    inter = np_geometry._polygon_intersection_area(ca, cb)
    union = a[:, 3] * a[:, 4]
    union = union[:, None] + (b[:, 3] * b[:, 4])[None, :] - inter
    ref = inter / np.clip(union, 1e-6, None)
    np.testing.assert_allclose(nat, ref, atol=2e-4)


def test_rotated_iou_identity_and_criteria():
    box = np.array([[1.0, 2.0, 4.0, 2.0, 0.7]], np.float32)
    assert native.rotated_iou_bev_native(box, box)[0, 0] == pytest.approx(1.0)
    small = box.copy()
    small[0, 2:4] /= 2  # quarter area, concentric & aligned
    # inter = area(small); criterion 1 divides by area_b
    v = native.rotated_iou_bev_native(box, small, criterion=1)[0, 0]
    assert v == pytest.approx(1.0, abs=1e-5)
    v = native.rotated_iou_bev_native(box, small, criterion=0)[0, 0]
    assert v == pytest.approx(0.25, abs=1e-5)


def test_dispatch_used_by_np_geometry():
    rng = np.random.RandomState(3)
    a = np.c_[rng.uniform(-10, 10, (5, 3)), rng.uniform(1, 4, (5, 3)),
              rng.uniform(-3, 3, (5, 1))].astype(np.float32)
    out = np_geometry.boxes_bev_iou_cpu(a, a)
    np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-5)
