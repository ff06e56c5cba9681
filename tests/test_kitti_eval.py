"""KITTI official eval protocol tests on hand-constructed annos."""

import numpy as np

from lidardetection_tpu.datasets.kitti.kitti_object_eval import eval as keval


def _anno(names, boxes_cam=None, bbox=None, scores=None, alpha=None,
          trunc=None, occl=None):
    n = len(names)
    boxes_cam = np.asarray(boxes_cam if boxes_cam is not None
                           else np.zeros((n, 7)), np.float64)
    return {
        'name': np.asarray(names),
        'truncated': np.asarray(trunc if trunc is not None else np.zeros(n)),
        'occluded': np.asarray(occl if occl is not None else np.zeros(n, np.int64)),
        'alpha': np.asarray(alpha if alpha is not None else np.full(n, -10.0)),
        'bbox': np.asarray(bbox if bbox is not None
                           else np.tile([0, 0, 50, 50], (n, 1)), np.float64),
        'dimensions': boxes_cam[:, 3:6],  # l, h, w
        'location': boxes_cam[:, 0:3],
        'rotation_y': boxes_cam[:, 6],
        'score': np.asarray(scores if scores is not None else np.ones(n)),
    }


def _cam_box(x, z, l=4.0, h=1.5, w=1.6, y=1.0, ry=0.0):
    return [x, y, z, l, h, w, ry]


def test_perfect_detection_ap_100():
    gt, dt = [], []
    for i in range(30):
        boxes = [_cam_box(i * 2.0, 10.0 + i), _cam_box(-5.0 + i, 20.0)]
        gt.append(_anno(['Car', 'Car'], boxes))
        dt.append(_anno(['Car', 'Car'], boxes,
                        scores=[0.9 - 0.002 * i, 0.8 - 0.002 * i]))
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    assert abs(ret['Car_3d/moderate_R40'] - 100.0) < 1e-6, ret
    assert abs(ret['Car_bev/moderate_R40'] - 100.0) < 1e-6
    assert abs(ret['Car_image/moderate_R40'] - 100.0) < 1e-6
    assert abs(ret['Car_3d/moderate'] - 100.0) < 1e-6


def test_missed_and_false_positive():
    # 2 gts per image; detector finds 1 correctly + 1 far-away FP
    gt, dt = [], []
    for i in range(4):
        gt.append(_anno(['Car', 'Car'],
                        [_cam_box(0.0, 10.0), _cam_box(8.0, 30.0)]))
        dt.append(_anno(['Car', 'Car'],
                        [_cam_box(0.0, 10.0), _cam_box(50.0, 90.0)],
                        scores=[0.9, 0.85]))
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    # recall caps at 0.5 -> 11-pt AP sums precision at r=0,0.1..0.5 (6 pts)
    ap = ret['Car_3d/moderate']
    assert 0 < ap < 60, ap


def test_wrong_rotation_fails_3d_but_not_bbox():
    gt, dt = [], []
    for i in range(50):
        gt.append(_anno(['Car'], [_cam_box(0.0, 10.0, ry=0.0)]))
        dt.append(_anno(['Car'], [_cam_box(0.0, 10.0, ry=np.pi / 2)],
                        scores=[0.9 - 0.002 * i]))
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_image/moderate_R40'] > 99.0
    assert ret['Car_3d/moderate_R40'] < 10.0  # iou(l=4, w=1.6 rotated 90) << 0.7


def test_van_ignored_for_car():
    # Van gts neither count as gt nor penalize car detections matching them
    gt = [_anno(['Van'], [_cam_box(0.0, 10.0)])]
    dt = [_anno(['Car'], [_cam_box(0.0, 10.0)], scores=[0.9])]
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    # no valid gt -> AP is 0/0 -> zeros, but detection must not be FP
    assert ret['Car_3d/moderate_R40'] == 0.0


def test_small_image_height_moves_to_harder_difficulty():
    # bbox height 30px: excluded from easy (min 40) but valid for moderate
    bbox_small = np.tile([0, 0, 30, 30], (1, 1))
    gt = [_anno(['Car'], [_cam_box(0.0, 10.0)], bbox=bbox_small)
          for _ in range(50)]
    dt = [_anno(['Car'], [_cam_box(0.0, 10.0)], bbox=bbox_small,
                scores=[0.9 - 0.002 * i]) for i in range(50)]
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] == 0.0
    assert ret['Car_3d/moderate_R40'] > 99.0


def test_aos_uses_alpha():
    gt, dt = [], []
    for i in range(50):
        gt.append(_anno(['Car'], [_cam_box(0.0, 10.0)], alpha=[0.0]))
        dt.append(_anno(['Car'], [_cam_box(0.0, 10.0)], alpha=[np.pi],
                        scores=[0.9 - 0.002 * i]))
    result, ret = keval.get_official_eval_result(gt, dt, ['Car'])
    # opposite orientation: similarity (1+cos(pi))/2 = 0 -> AOS ~ 0
    assert ret['Car_aos/moderate_R40'] < 1.0
    assert ret['Car_3d/moderate_R40'] > 99.0


def test_d3_overlap_half_height():
    a = np.array([_cam_box(0.0, 10.0, h=2.0, y=1.0)])
    b = np.array([_cam_box(0.0, 10.0, h=2.0, y=2.0)])  # y-extent [0,2] vs [-1,1]... wait camera y down: [y-h, y]
    o = keval.d3_box_overlap(a, b)
    # extents [-1,1] and [0,2]: overlap 1 of height 2 -> vol iou = A/2 / (A*3/2) = 1/3
    np.testing.assert_allclose(o, [[1.0 / 3.0]], atol=1e-4)


def test_coco_eval_perfect_detection():
    """COCO-style AP (eval.py:723-811): perfect dets -> 100 at every
    threshold in the range, so the threshold-mean is also 100."""
    gt, dt = [], []
    for i in range(30):
        boxes = [_cam_box(i * 2.0, 10.0 + i), _cam_box(-5.0 + i, 20.0)]
        gt.append(_anno(['Car', 'Car'], boxes))
        dt.append(_anno(['Car', 'Car'], boxes,
                        scores=[0.9 - 0.002 * i, 0.8 - 0.002 * i]))
    result = keval.get_coco_eval_result(gt, dt, ['Car'])
    assert 'coco AP@0.50:0.05:0.95' in result
    # parse the "3d   AP:a, b, c" line
    line = [ln for ln in result.splitlines() if ln.startswith('3d')][0]
    vals = [float(v) for v in line.split('AP:')[1].split(',')]
    assert all(abs(v - 100.0) < 1e-6 for v in vals), result


def test_coco_eval_imperfect_below_official():
    """Slightly offset boxes pass IoU 0.5 but fail the strictest COCO
    thresholds -> mean over thresholds < 100."""
    gt, dt = [], []
    for i in range(30):
        gt.append(_anno(['Car'], [_cam_box(i * 2.0, 10.0)]))
        # shift x by 0.55m: IoU ~ (4-0.55)/(4+0.55) ~ 0.76 for l=4 boxes
        dt.append(_anno(['Car'], [_cam_box(i * 2.0 + 0.55, 10.0)],
                        scores=[0.9 - 0.002 * i]))
    result = keval.get_coco_eval_result(gt, dt, ['Car'])
    line = [ln for ln in result.splitlines() if ln.startswith('3d')][0]
    moderate = float(line.split('AP:')[1].split(',')[1])
    assert 0.0 < moderate < 100.0, result


def test_native_stats_matches_python():
    """The C++ fused statistics path (native/kitti_stats.cpp) must be
    bit-identical to the Python matching loops on a realistic TP/FP/FN
    mix (same protocol, 20x faster at the 3,769-frame val scale)."""
    import sys
    from pathlib import Path

    import lidardetection_tpu.native as native

    if native.load() is None:
        import pytest
        pytest.skip('native library unavailable')
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
    from bench_kitti_eval import synth_annos

    gt, dt = synth_annos(40, seed=3)
    classes = ['Car', 'Pedestrian', 'Cyclist']
    _, r_native = keval.get_official_eval_result(gt, dt, classes)
    lib, tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, True  # force the Python path
        _, r_py = keval.get_official_eval_result(gt, dt, classes)
    finally:
        native._lib, native._tried = lib, tried
    assert r_native.keys() == r_py.keys()
    for k in r_py:
        assert abs(r_native[k] - r_py[k]) < 1e-9, (k, r_native[k], r_py[k])
