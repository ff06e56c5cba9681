"""PlusAI/Livox/Mix dataset protocol tests on synthesized directory trees."""

import pickle

import numpy as np
import pytest

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets.plusai.plusai_bag_dataset import (
    DemoDataset, stack_frames_to_base,
)
from lidardetection_tpu.datasets.plusai.plusai_dataset import (
    PlusAIMultiframeDataset, create_plusai_infos,
)


def make_mini_plusai(root, num_frames=2, t=3):
    rng = np.random.RandomState(0)
    (root / 'ImageSets').mkdir(parents=True)
    ids = []
    scene = 'scene_000'
    (root / scene / 'pointcloud').mkdir(parents=True)
    (root / scene / 'label').mkdir(parents=True)
    for i in range(num_frames):
        fid = f'{i:06d}'
        ids.append(f'{scene}/pointcloud/{fid}.bin')
        # stacked 5-feature cloud: car cluster + ground
        car = np.array([30.0, 2.0, 1.0])
        pts = np.concatenate([
            car + rng.randn(300, 3) * [2, 0.8, 0.8],
            np.c_[rng.uniform(2, 150, 3000), rng.uniform(-15, 15, 3000),
                  rng.normal(-0.3, 0.05, 3000)],
        ]).astype(np.float32)
        cloud = np.c_[pts, rng.rand(len(pts)), rng.randint(0, t, len(pts))]
        cloud.astype(np.float32).tofile(root / scene / 'pointcloud' / f'{fid}.bin')
        obstacles = []
        for k in range(2):
            frames = []
            base_loc = car + [0, 4.0 * k, 0]
            for fi in range(t):
                frames.append({
                    'class': 'Car' if k == 0 else 'Truck',
                    'location': (base_loc - [1.0 * (t - 1 - fi), 0, 0]).tolist(),
                    'size': [4.8, 1.9, 1.8] if k == 0 else [8.0, 2.5, 3.5],
                    'heading': 0.05 * k,
                    'velocity': [10.0, 0.0, 0.0],
                })
            obstacles.append(frames)
        with open(root / scene / 'label' / f'{fid}.pkl', 'wb') as f:
            pickle.dump({'obstacles': obstacles}, f)
    for split, split_ids in (('train', ids[:1]), ('val', ids[1:])):
        with open(root / 'ImageSets' / f'{split}.txt', 'w') as f:
            f.write('\n'.join(split_ids))
    return ids


@pytest.fixture(scope='module')
def plusai_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('mini_plusai')
    make_mini_plusai(root)
    return root


def test_plusai_multiframe_pipeline(plusai_root):
    cfg = cfg_from_yaml_file(
        'tools/cfgs/dataset_configs/plusai_multiframe_dataset.yaml')
    cfg.DATA_PATH = str(plusai_root)
    del cfg.DATA_AUGMENTOR
    cfg.MAX_POINTS = 8000
    cfg.DATA_PROCESSOR[1].NUM_POINTS = {'train': 8000, 'test': 8000}
    create_plusai_infos(cfg, ['Car', 'Truck'], plusai_root, plusai_root)
    ds = PlusAIMultiframeDataset(cfg, ['Car', 'Truck'], training=True,
                                 root_path=plusai_root)
    assert len(ds) == 1
    sample = ds[0]
    assert sample['locations'].shape == (64, 3, 3)
    assert sample['rotations_y'].shape == (64, 3)
    gt = sample['gt_boxes']
    assert (gt[:, -1] > 0).sum() == 2
    # base frame (idx 1) pose used for gt center
    car_row = gt[gt[:, -1] == 1][0]
    np.testing.assert_allclose(car_row[0], 29.0, atol=1e-4)  # 30 - 1*(t-1-1)

    # gt database was created for gt_sampling
    with open(plusai_root / 'plusai_dbinfos_train.pkl', 'rb') as f:
        db = pickle.load(f)
    assert 'Car' in db and 'locations' in db['Car'][0]


def test_plusai_eval_roundtrip(plusai_root):
    cfg = cfg_from_yaml_file(
        'tools/cfgs/dataset_configs/plusai_multiframe_dataset.yaml')
    cfg.DATA_PATH = str(plusai_root)
    ds = PlusAIMultiframeDataset(cfg, ['Car', 'Truck'], training=False,
                                 root_path=plusai_root)
    assert len(ds) == 1
    info = ds.plusai_infos[0]
    gt = info['annos']['gt_boxes_lidar']
    preds = {
        'pred_boxes': gt[None].astype(np.float32),
        'pred_scores': np.full((1, len(gt)), 0.9),
        'pred_labels': np.array([[1, 2]]),
        'num_preds': np.array([len(gt)]),
    }
    batch = {'batch_size': 1, 'frame_id': [info['point_cloud']['lidar_idx']]}
    annos = ds.generate_prediction_dicts(batch, preds, ['Car', 'Truck'])
    result, ret = ds.evaluation(annos, ['Car', 'Truck'])
    assert 'Car' in result  # perfect predictions evaluate without error


def test_stack_frames_to_base():
    pts = np.zeros((2, 3), np.float32)
    pts[1] = [1.0, 0.0, 0.0]
    # frame 0 at origin; frame 1 translated +10m in x (world)
    frames = [
        (0.0, (np.zeros(3), np.array([0, 0, 0, 1.0])), pts.copy()),
        (0.1, (np.array([10.0, 0, 0]), np.array([0, 0, 0, 1.0])), pts.copy()),
    ]
    stacked = stack_frames_to_base(frames, base_frame_index=1)
    assert stacked.shape == (4, 4)  # + frame index column
    # frame 0 points land at -10m in the base frame
    np.testing.assert_allclose(stacked[0, 0], -10.0, atol=1e-6)
    np.testing.assert_allclose(stacked[2, 0], 0.0, atol=1e-6)
    np.testing.assert_array_equal(stacked[:, 3], [0, 0, 1, 1])


def test_demo_dataset(tmp_path):
    cloud = np.random.rand(100, 4).astype(np.float32)
    cloud.tofile(tmp_path / 'frame0.bin')
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.MAX_POINTS = 256
    ds = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root_path=tmp_path)
    assert len(ds) == 1
    sample = ds[0]
    assert sample['voxels'].shape[1:] == (32, 4)
