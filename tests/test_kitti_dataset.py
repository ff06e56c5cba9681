"""KITTI dataset pipeline on a synthesized mini-KITTI directory tree."""

import numpy as np
import pytest
from PIL import Image

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets.kitti.kitti_dataset import (
    KittiDataset, create_kitti_infos,
)

NUM_FRAMES = 3


def make_mini_kitti(root):
    """Three frames with one car + one pedestrian each."""
    rng = np.random.RandomState(0)
    (root / 'ImageSets').mkdir(parents=True)
    for split, ids in (('train', [0, 1]), ('val', [2]), ('test', [])):
        with open(root / 'ImageSets' / f'{split}.txt', 'w') as f:
            f.write('\n'.join(f'{i:06d}' for i in ids))
    tdir = root / 'training'
    for sub in ('velodyne', 'calib', 'label_2', 'image_2', 'planes'):
        (tdir / sub).mkdir(parents=True)

    # identity-ish calib: camera at lidar origin, x_cam = -y_l, y_cam = -z_l,
    # z_cam = x_l (standard KITTI-style axes)
    v2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    p2 = np.array([[700, 0, 600, 0], [0, 700, 200, 0], [0, 0, 1, 0]], np.float32)
    r0 = np.eye(3, dtype=np.float32)
    calib_txt = '\n'.join([
        'P0: ' + ' '.join('%g' % v for v in p2.flatten()),
        'P1: ' + ' '.join('%g' % v for v in p2.flatten()),
        'P2: ' + ' '.join('%g' % v for v in p2.flatten()),
        'P3: ' + ' '.join('%g' % v for v in p2.flatten()),
        'R0_rect: ' + ' '.join('%g' % v for v in r0.flatten()),
        'Tr_velo_to_cam: ' + ' '.join('%g' % v for v in v2c.flatten()),
        'Tr_imu_to_velo: ' + ' '.join('%g' % v for v in v2c.flatten()),
    ])

    for i in range(NUM_FRAMES):
        fid = f'{i:06d}'
        # objects in lidar frame: car at (12+i, 1, -0.8), ped at (8, -2, -0.6)
        car_xyz_l = np.array([12.0 + i, 1.0, -0.8])
        ped_xyz_l = np.array([8.0, -2.0, -0.6])
        pts = [
            car_xyz_l + rng.randn(400, 3) * [1.2, 0.5, 0.4],
            ped_xyz_l + rng.randn(150, 3) * [0.2, 0.2, 0.5],
            np.c_[rng.uniform(0, 40, 3000), rng.uniform(-15, 15, 3000),
                  rng.normal(-1.6, 0.05, 3000)],
        ]
        cloud = np.concatenate(pts).astype(np.float32)
        cloud = np.c_[cloud, rng.rand(len(cloud)).astype(np.float32)]
        cloud.astype(np.float32).tofile(tdir / 'velodyne' / f'{fid}.bin')

        with open(tdir / 'calib' / f'{fid}.txt', 'w') as f:
            f.write(calib_txt)

        # labels in camera frame: loc_cam = (-y, -z, x); y is box bottom
        def cam_label(name, xyz_l, h, w, l, ry):
            x, y, z = -xyz_l[1], -(xyz_l[2]) + h / 2, xyz_l[0]
            return (f'{name} 0.00 0 0.0 300.0 150.0 400.0 250.0 '
                    f'{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}')

        with open(tdir / 'label_2' / f'{fid}.txt', 'w') as f:
            f.write(cam_label('Car', car_xyz_l, 1.5, 1.6, 3.9, 0.1) + '\n')
            f.write(cam_label('Pedestrian', ped_xyz_l, 1.7, 0.6, 0.8, -0.5) + '\n')
            f.write('DontCare -1 -1 -10 500 160 520 170 '
                    '-1 -1 -1 -1000 -1000 -1000 -10\n')

        Image.new('RGB', (1242, 375)).save(tdir / 'image_2' / f'{fid}.png')
        with open(tdir / 'planes' / f'{fid}.txt', 'w') as f:
            f.write('# Plane\nWidth 4\nHeight 1\n0 -1 0 1.6\n')


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('mini_kitti')
    make_mini_kitti(root)
    cfg = cfg_from_yaml_file('tools/cfgs/dataset_configs/kitti_dataset.yaml')
    create_kitti_infos(cfg, ['Car', 'Pedestrian', 'Cyclist'], root, root,
                       workers=1)
    return root


def test_infos_created(kitti_root):
    import pickle
    with open(kitti_root / 'kitti_infos_train.pkl', 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    a = infos[0]['annos']
    assert set(a['name']) == {'Car', 'Pedestrian', 'DontCare'}
    # gt boxes back in lidar frame near the synthesized centers
    car = a['gt_boxes_lidar'][list(a['name']).index('Car')]
    np.testing.assert_allclose(car[:3], [12.0, 1.0, -0.8], atol=0.05)
    assert a['num_points_in_gt'][0] > 50


def test_gt_database_created(kitti_root):
    import pickle
    with open(kitti_root / 'kitti_dbinfos_train.pkl', 'rb') as f:
        db = pickle.load(f)
    assert 'Car' in db and 'Pedestrian' in db
    assert db['Car'][0]['num_points_in_gt'] > 50
    obj = np.fromfile(str(kitti_root / db['Car'][0]['path']),
                      np.float32).reshape(-1, 4)
    # stored points are centered on the box
    assert np.abs(obj[:, :3].mean(0)).max() < 2.0


def test_train_pipeline_with_augmentor(kitti_root):
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.DATA_PATH = str(kitti_root)
    cfg.DATA_CONFIG.MAX_POINTS = 20000
    cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST[0].USE_ROAD_PLANE = True
    cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST[0].PREPARE.filter_by_min_points = \
        ['Car:5', 'Pedestrian:5', 'Cyclist:5']
    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True,
                           root_path=kitti_root)
    assert len(dataset) == 2
    sample = dataset[0]
    assert sample['voxels'].shape[1:] == (32, 4)
    gt = sample['gt_boxes']
    n_gt = int((gt[:, -1] > 0).sum())
    # gt sampling pastes up to 15 cars + 15 peds (db has few, but >2 original)
    assert n_gt >= 2
    assert sample['num_voxels'] > 100


def test_eval_roundtrip_perfect_predictions(kitti_root):
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.DATA_PATH = str(kitti_root)
    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=kitti_root)
    assert len(dataset) == 1
    # feed the gt back as predictions -> should be recallable by eval
    info = dataset.kitti_infos[0]
    annos = info['annos']
    keep = annos['name'] != 'DontCare'
    gt_lidar = annos['gt_boxes_lidar']
    labels = np.array([{'Car': 1, 'Pedestrian': 2}[n]
                       for n in annos['name'][keep]])
    n = len(gt_lidar)
    pred_dicts = {
        'pred_boxes': np.pad(gt_lidar, ((0, 3 - n % 3 if n % 3 else 0), (0, 0)))[None],
        'pred_scores': np.full((1, n), 0.9),
        'pred_labels': labels[None],
        'num_preds': np.array([n]),
    }
    pred_dicts['pred_boxes'] = gt_lidar[None]
    batch_dict = {
        'batch_size': 1,
        'frame_id': [info['point_cloud']['lidar_idx']],
        'calib': [dataset.get_calib(info['point_cloud']['lidar_idx'])],
        'image_shape': [info['image']['image_shape']],
    }
    det_annos = dataset.generate_prediction_dicts(
        batch_dict, pred_dicts, cfg.CLASS_NAMES)
    assert len(det_annos) == 1
    # camera-frame roundtrip: location/rotation recovered
    da = det_annos[0]
    gt_cam = np.concatenate([annos['location'][keep],
                             annos['dimensions'][keep]], axis=1)
    np.testing.assert_allclose(da['location'], gt_cam[:, :3], atol=1e-3)
    np.testing.assert_allclose(da['dimensions'], gt_cam[:, 3:6], atol=1e-3)
    result_str, result_dict = dataset.evaluation(det_annos, cfg.CLASS_NAMES)
    assert 'Car' in result_str
