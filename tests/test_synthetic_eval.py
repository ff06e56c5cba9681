"""SyntheticDataset KITTI-protocol evaluation: perfect detections must
score ~100 AP (the accuracy gate tools/train_to_ap.py builds on)."""

import numpy as np

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets.synthetic import (
    SyntheticDataset, kitti_anno_from_lidar, make_scene,
)


def _dataset(num_scenes):
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del cfg.DATA_CONFIG.DATA_AUGMENTOR
    return SyntheticDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                            training=False, num_scenes=num_scenes)


def test_perfect_detections_score_full_ap():
    ds = _dataset(48)  # >= 41 valid gt per class fills all 40 recall points
    dets = []
    for i in range(len(ds)):
        rng = np.random.RandomState(i)
        _, gt, names = make_scene(rng, ds.point_cloud_range,
                                  class_names=ds.class_names)
        a = kitti_anno_from_lidar(gt, names,
                                  scores=np.linspace(0.9, 0.5, len(gt)))
        a['frame_id'] = i
        dets.append(a)
    _s, ret = ds.evaluation(dets, list(ds.class_names))
    for cls in ('Car', 'Pedestrian', 'Cyclist'):
        assert ret[f'{cls}_3d/moderate_R40'] > 99.0, (cls, ret)
        assert ret[f'{cls}_bev/moderate_R40'] > 99.0, (cls, ret)


def test_shifted_detections_lose_ap():
    ds = _dataset(16)
    dets = []
    for i in range(len(ds)):
        rng = np.random.RandomState(i)
        _, gt, names = make_scene(rng, ds.point_cloud_range,
                                  class_names=ds.class_names)
        gt = gt.copy()
        gt[:, 0] += 3.0  # 3 m longitudinal error: no 0.7-IoU car matches
        a = kitti_anno_from_lidar(gt, names,
                                  scores=np.linspace(0.9, 0.5, len(gt)))
        a['frame_id'] = i
        dets.append(a)
    _s, ret = ds.evaluation(dets, list(ds.class_names))
    assert ret['Car_3d/moderate_R40'] < 5.0, ret


def test_make_scene_objects_disjoint():
    for i in range(20):
        rng = np.random.RandomState(1000 + i)
        _, gt, _ = make_scene(rng, [0, -39.68, -3, 69.12, 39.68, 1])
        for a in range(len(gt)):
            for b in range(a + 1, len(gt)):
                d = np.hypot(gt[a, 0] - gt[b, 0], gt[a, 1] - gt[b, 1])
                assert d > (np.hypot(*gt[a, 3:5]) + np.hypot(*gt[b, 3:5])) / 2
