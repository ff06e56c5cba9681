"""ctypes bindings for the native host kernels (voxelizer.cpp).

Mirrors the role of the reference's compiled host ops (spconv voxel
generator; pcdet/ops/iou3d_nms CPU paths). The library is compiled on first
use with g++ into ``_build/libnative.so`` inside this package; if no
compiler is available the callers fall back to their numpy twins, so the
framework stays importable everywhere.

Set ``LIDARDET_TPU_DISABLE_NATIVE=1`` to force the numpy paths.
"""

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRCS = [_HERE / 'voxelizer.cpp', _HERE / 'rulebooks.cpp',
         _HERE / 'kitti_stats.cpp']
_SO = _HERE / '_build' / 'libnative.so'
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    _SO.parent.mkdir(exist_ok=True)
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           *[str(s) for s in _SRCS], '-o', str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get('LIDARDET_TPU_DISABLE_NATIVE'):
            return None
        try:
            src_mtime = max(s.stat().st_mtime for s in _SRCS)
            if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except (OSError, subprocess.CalledProcessError):
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.voxelize_f32.restype = ctypes.c_int32
        lib.voxelize_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, f32p, f32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, f32p, i32p, i32p]
        lib.rotated_iou_bev.restype = None
        lib.rotated_iou_bev.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32, f32p]
        lib.build_rulebooks.restype = ctypes.c_int32
        lib.build_rulebooks.argtypes = [
            i32p, ctypes.c_int32, ctypes.c_int32, i64p, i32p,
            ctypes.c_int32, i32p, i32p, i32p]
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.kitti_tp_scores.restype = ctypes.c_int32
        lib.kitti_tp_scores.argtypes = [
            f64p, ctypes.c_int32, ctypes.c_int32, f64p, i32p, i32p,
            ctypes.c_double, f64p]
        lib.kitti_fused_stats.restype = None
        lib.kitti_fused_stats.argtypes = [
            f64p, ctypes.c_int32, ctypes.c_int32, f64p, f64p, f64p,
            f64p, ctypes.c_int32, i32p, i32p, ctypes.c_int32,
            ctypes.c_double, f64p, ctypes.c_int32, ctypes.c_int32, f64p]
        _lib = lib
        return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def voxelize_native(points, point_cloud_range, voxel_size,
                    max_points_per_voxel, max_voxels, sort_rows=True):
    """Native twin of ops.voxelize.voxelize_np; returns None if lib missing."""
    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    pc_range = np.ascontiguousarray(point_cloud_range, dtype=np.float32)
    vsz = np.ascontiguousarray(voxel_size, dtype=np.float32)
    n, c = points.shape
    voxels = np.empty((max_voxels, max_points_per_voxel, c), np.float32)
    coords = np.empty((max_voxels, 3), np.int32)
    num_points = np.empty((max_voxels,), np.int32)
    n_vox = lib.voxelize_f32(
        _f32p(points), n, c, _f32p(pc_range), _f32p(vsz),
        max_points_per_voxel, max_voxels, int(sort_rows),
        _f32p(voxels), _i32p(coords), _i32p(num_points))
    return voxels, coords, num_points, int(n_vox)


def build_rulebooks_native(coords, n_vox, cap_in, spatial_shape, plan_records,
                           total_rb, total_oc, n_down):
    """Native sparse rulebook chain (rulebooks.cpp); see ops/sparse_plan.py.

    Returns (rb_buf, oc_buf, on_buf) flat int32 arrays, or raises if the
    library is unavailable (callers check native.load() first).
    """
    lib = load()
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    spatial = np.ascontiguousarray(spatial_shape, dtype=np.int64)
    plan = np.ascontiguousarray(plan_records, dtype=np.int32)
    rb_buf = np.empty(total_rb, np.int32)
    oc_buf = np.empty(max(total_oc, 1), np.int32)
    on_buf = np.empty(max(n_down, 1), np.int32)
    rc = lib.build_rulebooks(
        _i32p(coords), int(n_vox), int(cap_in),
        spatial.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(plan), plan.shape[0], _i32p(rb_buf), _i32p(oc_buf),
        _i32p(on_buf))
    if rc != 0:
        raise ValueError(f'build_rulebooks failed (rc={rc})')
    return rb_buf, oc_buf[:total_oc], on_buf[:n_down]


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kitti_tp_scores_native(overlaps, dt_scores, ignored_gt, ignored_det,
                           min_overlap):
    """First matching pass of the KITTI protocol (kitti_stats.cpp);
    returns the matched detection scores, or None if lib missing."""
    lib = load()
    if lib is None:
        return None
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    dt_scores = np.ascontiguousarray(dt_scores, np.float64)
    ig = np.ascontiguousarray(ignored_gt, np.int32)
    idet = np.ascontiguousarray(ignored_det, np.int32)
    det_size, gt_size = overlaps.shape
    out = np.empty(max(gt_size, 1), np.float64)
    n = lib.kitti_tp_scores(_f64p(overlaps), det_size, gt_size,
                            _f64p(dt_scores), _i32p(ig), _i32p(idet),
                            float(min_overlap), _f64p(out))
    return out[:n]


def kitti_fused_stats_native(overlaps, dt_scores, dt_alphas, gt_alphas,
                             dt_dc_overlap, ignored_gt, ignored_det,
                             metric, min_overlap, thresholds, compute_aos,
                             pr):
    """Threshold-fused second pass; accumulates into pr (T, 4) float64
    in-place. Returns False if the lib is missing (caller falls back)."""
    lib = load()
    if lib is None:
        return False
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    dt_scores = np.ascontiguousarray(dt_scores, np.float64)
    dt_alphas = np.ascontiguousarray(dt_alphas, np.float64)
    gt_alphas = np.ascontiguousarray(gt_alphas, np.float64)
    ig = np.ascontiguousarray(ignored_gt, np.int32)
    idet = np.ascontiguousarray(ignored_det, np.int32)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    det_size, gt_size = overlaps.shape
    if dt_dc_overlap is None or dt_dc_overlap.size == 0:
        n_dc = 0
        dcp = _f64p(np.empty(1, np.float64))
    else:
        dt_dc_overlap = np.ascontiguousarray(dt_dc_overlap, np.float64)
        n_dc = dt_dc_overlap.shape[1]
        dcp = _f64p(dt_dc_overlap)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    lib.kitti_fused_stats(_f64p(overlaps), det_size, gt_size,
                          _f64p(dt_scores), _f64p(dt_alphas),
                          _f64p(gt_alphas), dcp, n_dc, _i32p(ig),
                          _i32p(idet), int(metric), float(min_overlap),
                          _f64p(thresholds), len(thresholds),
                          int(bool(compute_aos)), _f64p(pr))
    return True


def rotated_iou_bev_native(boxes_a, boxes_b, criterion=-1):
    """Native twin of np_geometry.boxes_bev_iou_cpu ((cx,cy,dx,dy,rz) boxes);
    returns None if lib missing."""
    lib = load()
    if lib is None:
        return None
    boxes_a = np.ascontiguousarray(boxes_a, dtype=np.float32)
    boxes_b = np.ascontiguousarray(boxes_b, dtype=np.float32)
    out = np.empty((boxes_a.shape[0], boxes_b.shape[0]), np.float32)
    lib.rotated_iou_bev(_f32p(boxes_a), boxes_a.shape[0],
                        _f32p(boxes_b), boxes_b.shape[0],
                        int(criterion), _f32p(out))
    return out
