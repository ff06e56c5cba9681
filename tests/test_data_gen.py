"""Offline data-generation pipelines: fake lidar, gt-db, MOT stacking, mix."""

import pickle

import numpy as np
import pytest

from lidardetection_tpu.datasets.mix_data.gen_mix_dataset import (
    generate_mix_dataset,
)
from lidardetection_tpu.datasets.plusai.fake_lidar_dataset import (
    create_groundtruth_database, estimate_ground_plane_batch,
    find_plane, generate_fake_lidar, get_angle_pitch,
)
from lidardetection_tpu.datasets.plusai.mot_dataset import (
    prepare_multiframe_dataset, process_obstacles,
)


def test_find_plane_ransac():
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 50, (500, 2))
    z = 0.02 * xy[:, 0] - 0.01 * xy[:, 1] + 0.3 + rng.randn(500) * 0.005
    pts = np.c_[xy, z]
    # 20% outliers
    pts[::5, 2] += rng.uniform(1, 3, 100)
    a, b, d = find_plane(pts)
    assert abs(a - 0.02) < 5e-3 and abs(b + 0.01) < 5e-3 and abs(d - 0.3) < 5e-2
    assert abs(get_angle_pitch(a, b, d) + np.arctan2(a, 1)) < 1e-9


@pytest.fixture
def fake_tree(tmp_path):
    rng = np.random.RandomState(1)
    # blank scenes: flat-ish ground
    scene_dir = tmp_path / 'blank'
    scene_dir.mkdir()
    for k in range(2):
        pts = np.c_[rng.uniform(0, 120, (3000, 1)),
                    rng.uniform(-15, 15, (3000, 1)),
                    rng.normal(0.1, 0.01, (3000, 1))]
        np.savetxt(scene_dir / f'scene{k}.txt', pts)
    # gt database: two cars, one truck
    gt_root = tmp_path / 'gtdata'
    (gt_root / 'gt_database').mkdir(parents=True)
    db = {'Car': [], 'Truck': []}
    for i, (name, size) in enumerate(
            (('Car', [4.5, 1.9, 1.6]), ('Car', [4.8, 2.0, 1.5]),
             ('Truck', [9.0, 2.5, 3.2]))):
        obj_pts = rng.randn(120, 3) * 0.5
        path = f'gt_database/{name}_{i}.bin'
        obj_pts.astype(np.float64).tofile(gt_root / path)
        db[name].append({
            'name': name, 'path': path,
            'box3d_lidar': np.array(
                [30.0 + 20 * i, (i - 1) * 4.0, 0.8, *size, 0.1 * i]),
            'num_points_in_gt': 120,
        })
    with open(gt_root / 'plusai_gt_dbinfos.pkl', 'wb') as f:
        pickle.dump(db, f)
    return scene_dir, gt_root, tmp_path / 'fake_out'


def test_generate_fake_lidar(fake_tree):
    scene_dir, gt_root, out = fake_tree
    params = estimate_ground_plane_batch(scene_dir)
    assert len(params) == 2
    ids = generate_fake_lidar(
        num_frames=2, num_objects_per_frame=6,
        object_range=(0, -20, -3, 150, 20, 3),
        gt_data_path=gt_root, blank_scene_path=scene_dir, output_path=out)
    assert ids == ['000000', '000001']
    pts = np.fromfile(out / 'pointcloud' / '000000.bin',
                      np.float64).reshape(-1, 3)
    assert len(pts) > 1000
    with open(out / 'label' / '000000.pkl', 'rb') as f:
        labels = pickle.load(f)
    assert labels and all('box3d_lidar' in o for o in labels)
    # sampled boxes snapped near the ground plane (z ~ 0.1 + dz/2)
    for o in labels:
        box = o['box3d_lidar']
        assert abs(box[2] - box[5] / 2) < 0.65

    # gt-db extraction roundtrip on the generated tree
    db = create_groundtruth_database(out, used_classes=('Car', 'Truck'))
    total = sum(len(v) for v in db.values())
    assert total == sum(
        len(pickle.load(open(out / 'label' / f'{i}.pkl', 'rb'))) for i in ids)


def test_process_obstacles_gap_fill():
    def obs(x, vx=10.0):
        return {'class': 'Car', 'size': [4.5, 1.9, 1.6],
                'is_front_car': False,
                'location': np.array([x, 0.0, 0.8]),
                'heading': 0.0, 'velocity': np.array([vx, 0.0, 0.0])}
    # middle frame missing -> interpolated
    tracks = process_obstacles({'a': [obs(10.0), obs(11.0), {}]})
    assert len(tracks) == 1
    filled = tracks[0][2]
    np.testing.assert_allclose(filled['location'][0], 12.0, atol=1e-6)
    # unobserved at base frame -> dropped
    assert process_obstacles({'b': [obs(1.0), {}, {}]}) == []


def test_prepare_multiframe_dataset(tmp_path):
    rng = np.random.RandomState(2)
    scene = tmp_path / 'mot_dataset' / 's0'
    (scene / 'pointcloud').mkdir(parents=True)
    (scene / 'label').mkdir()
    for i in range(4):
        pts = rng.rand(200, 4).astype(np.float32)
        pts.tofile(scene / 'pointcloud' / f'{i:06d}.bin')
        annos = {
            'timestamp': 1000.0 + 0.1 * i,
            'trans': np.array([2.0 * i, 0.0, 0.0]),
            'quat': np.array([0, 0, 0, 1.0]),
            'bag_name': 'bag0', 'frame_index': i,
            'obstacle_list': [{
                'uuid': 'u0',
                'position': {'x': 30.0 + i, 'y': 0.0, 'z': 0.8},
                'direction': {'x': 1.0, 'y': 0.0},
                'velocity': {'x': 10.0, 'y': 0.0, 'z': 0.0},
                'size': [4.5, 1.9, 1.6], 'is_front_car': False,
            }],
        }
        with open(scene / 'label' / f'{i:06d}.pkl', 'wb') as f:
            pickle.dump(annos, f)
    prepare_multiframe_dataset(tmp_path)
    out = tmp_path / 'multiframe' / 's0'
    assert sorted(p.name for p in (out / 'label').iterdir()) == \
        ['000000.pkl', '000001.pkl']
    pts = np.fromfile(out / 'pointcloud' / '000000.bin',
                      np.float32).reshape(-1, 5)
    assert set(np.unique(pts[:, 4])) == {0.0, 1.0, 2.0}
    with open(out / 'label' / '000000.pkl', 'rb') as f:
        final = pickle.load(f)
    assert len(final['obstacles']) == 1
    track = final['obstacles'][0]
    # positions are ego-frame: world x = 2i + (30+i); base ego at x=2
    # -> base-local x = 28 + 3i
    np.testing.assert_allclose(track[1]['location'][0], 31.0, atol=1e-6)
    np.testing.assert_allclose(track[0]['location'][0], 28.0, atol=1e-6)


def test_generate_mix_dataset(tmp_path):
    rng = np.random.RandomState(3)
    for k, (name, nfeat) in enumerate((('livox', 4), ('fake', 3))):
        root = tmp_path / name / 'training'
        (root / 'pointcloud').mkdir(parents=True)
        (root / 'label').mkdir()
        for i in range(3):
            rng.rand(50, nfeat).astype(np.float64).tofile(
                root / 'pointcloud' / f'{i:06d}.bin')
            labels = [{'name': 'car' if k == 0 else 'Car',
                       'box3d_lidar': np.array([20, 0, 1.0, 4.5, 1.9, 1.6, 0.0])}]
            with open(root / 'label' / f'{i:06d}.pkl', 'wb') as f:
                pickle.dump(labels, f)
    ids = generate_mix_dataset(tmp_path / 'livox', tmp_path / 'fake',
                               tmp_path / 'mix', num_frames=4)
    assert len(ids) == 4
    with open(tmp_path / 'mix' / 'training' / 'label' / '000000.pkl',
              'rb') as f:
        labels = pickle.load(f)
    assert labels[0]['name'] in ('Car', 'Truck')
