"""Tracker + MOT metrics tests."""

import numpy as np

from lidardetection_tpu.utils.tracker_for_inference import TrackingManager


def make_preds(boxes, scores=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    n = len(boxes)
    return {
        'pred_boxes': boxes[None],
        'pred_scores': (np.asarray(scores, np.float64)
                        if scores is not None else np.full(n, 0.9))[None],
        'pred_labels': np.ones((1, n), np.int64),
        'num_preds': np.array([n]),
    }


def test_track_follows_moving_object():
    tm = TrackingManager({'CLASS_NAMES': ['Car']})
    for t in range(6):
        x = 10.0 + 0.5 * t
        tracked = tm.update_tracking(make_preds([[x, 1.0, -0.8, 4, 1.8, 1.5, 0.0]]))
    assert len(tracked['object_ids']) == 1
    tid = tracked['object_ids'][0]
    assert abs(tracked['pred_boxes'][0][0] - 12.5) < 0.5
    # same id persists
    tracked = tm.update_tracking(make_preds([[13.0, 1.0, -0.8, 4, 1.8, 1.5, 0.0]]))
    assert tracked['object_ids'][0] == tid


def test_track_predicts_through_dropout():
    tm = TrackingManager({'CLASS_NAMES': ['Car']})
    for t in range(5):
        tm.update_tracking(make_preds([[10.0 + t, 0.0, -0.8, 4, 1.8, 1.5, 0.0]]))
    # dropout: one empty frame -> prediction keeps the track alive and moving
    tracked = tm.update_tracking(make_preds(np.zeros((0, 7))))
    assert len(tracked['object_ids']) == 1
    assert tracked['pred_boxes'][0][0] > 14.0  # extrapolated forward


def test_track_dies_after_lose_tracking():
    tm = TrackingManager({'CLASS_NAMES': ['Car']})
    for t in range(5):
        tm.update_tracking(make_preds([[10.0, 0.0, -0.8, 4, 1.8, 1.5, 0.0]]))
    for _ in range(3):
        tracked = tm.update_tracking(make_preds(np.zeros((0, 7))))
    assert len(tm.tracker_list) == 0


def test_low_score_does_not_start_track():
    tm = TrackingManager({'CLASS_NAMES': ['Car']})
    for _ in range(4):
        tracked = tm.update_tracking(
            make_preds([[10.0, 0.0, -0.8, 4, 1.8, 1.5, 0.0]], scores=[0.3]))
    assert len(tm.tracker_list) == 0


def test_mot_metrics():
    import sys
    sys.path.insert(0, 'tools')
    from mot_benchmark import get_metrics

    gt = np.array([[10.0, 0.0, -0.8, 4, 1.8, 1.5, 0.0],
                   [50.0, 5.0, -0.8, 4, 1.8, 1.5, 0.0]])
    det = np.array([[10.1, 0.05, -0.8, 4, 1.8, 1.5, 0.0],   # match
                    [30.0, -5.0, -0.8, 4, 1.8, 1.5, 0.0]])  # FP
    tp, nd, ng, err = get_metrics(gt, det, range_thres=40, iou_thres=0.5)
    assert tp == 1 and nd == 2 and ng == 1
    assert 0 < err < 0.2
    # far bin includes the second gt
    tp, nd, ng, err = get_metrics(gt, det, range_thres=80, iou_thres=0.5)
    assert ng == 2 and tp == 1
