"""BEV raster canvas visualization (data_viz canvas path).

Mirrors reference pcdet/utils/data_viz.py:5-106 semantics: canvas sizing
from bev_range/resolution, per-frame coloring of temporal-stack boxes and
frame-indexed points, uint8 BGR output suitable for video writers.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from lidardetection_tpu.utils.data_viz import (
    bev_canvas, plot_feature_map, plot_multiframe_boxes,
)

BEV = [0, -40, -3, 70.4, 40, 1]


def _mk_points(n=500, frame_col=False, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.c_[rng.uniform(1, 69, n), rng.uniform(-39, 39, n),
                rng.uniform(-2, 0.5, n), rng.uniform(0, 1, n)]
    if frame_col:
        pts = np.c_[pts, rng.randint(0, 3, n)]
    return pts


def test_bev_canvas_shape_and_points():
    pts = _mk_points()
    boxes = np.array([[20.0, 5.0, 0.0, 4.0, 1.8, 1.5, 0.3]])
    canvas = bev_canvas(pts, boxes, BEV, gt_boxes=boxes,
                        scores=[0.9], labels=[1], info='frame 0')
    h = int((BEV[3] - BEV[0]) / 0.1 + 1)
    w = int((BEV[4] - BEV[1]) / 0.1 + 1)
    assert canvas.shape == (h, w, 3) and canvas.dtype == np.uint8
    # points rasterized yellow-cyan (0,255,255); dets leave red pixels
    assert (canvas == np.array([0, 255, 255])).all(axis=-1).sum() > 100
    assert (canvas[..., 2] == 255).sum() > 0


def test_multiframe_per_frame_colors():
    pts = _mk_points(frame_col=True)
    # 2 dets x 3 stacked frame poses, drifting in x
    boxes = np.stack([
        np.array([[20 + t, 0, 0, 4, 1.8, 1.5, 0.0] for t in range(3)]),
        np.array([[40 + t, -10, 0, 4, 1.8, 1.5, 1.2] for t in range(3)]),
    ])
    canvas = plot_multiframe_boxes(pts, boxes, BEV,
                                   scores=np.array([0.8, 0.7]),
                                   labels=np.array([1, 2]))
    assert canvas.dtype == np.uint8
    # all three per-frame det colors must appear
    for color in [(255, 100, 100), (100, 255, 100), (100, 100, 255)]:
        assert (canvas == np.array(color)).all(axis=-1).any(), color
    # frame-indexed points use the dim per-frame palette
    assert (canvas == np.array([180, 0, 0])).all(axis=-1).any()


def test_multiframe_accepts_single_frame_boxes():
    pts = _mk_points()
    boxes = np.array([[20.0, 5.0, 0.0, 4.0, 1.8, 1.5, 0.3]])  # (N, 7)
    canvas = plot_multiframe_boxes(pts, boxes, BEV)
    assert (canvas == np.array([255, 100, 100])).all(axis=-1).any()


def test_plot_feature_map(tmp_path):
    fmap = np.random.RandomState(0).randn(8, 32, 48).astype(np.float32)
    p = plot_feature_map(fmap, path=str(tmp_path / 'fm.jpg'))
    img = cv2.imread(p)
    assert img is not None and img.shape[:2] == (32, 48)
    # NHWC layout + explicit channel
    p2 = plot_feature_map(fmap.transpose(1, 2, 0), channel=3,
                          path=str(tmp_path / 'fm2.jpg'))
    assert cv2.imread(p2).shape[:2] == (32, 48)
