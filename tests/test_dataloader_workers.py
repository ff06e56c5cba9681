"""Process-pool prefetcher: batch composition and shapes match the serial
path (the reference trains through DataLoader(num_workers) CPU processes,
pcdet/datasets/__init__.py:60-70; here workers build whole collated batches).
"""

import numpy as np
import pytest

from lidardetection_tpu.config import cfg_from_yaml_file
from lidardetection_tpu.datasets import DataLoader, build_dataloader

CFG_FILE = 'tools/cfgs/kitti_models/pointpillar.yaml'


@pytest.fixture(scope='module')
def dataset():
    c = cfg_from_yaml_file(CFG_FILE)
    c.DATA_CONFIG.MAX_POINTS = 6000
    c.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {
        'train': 1500, 'test': 1500}
    c.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.32, 0.32, 4]
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR
    # drop the global point shuffle so sample tensors are index-deterministic
    c.DATA_CONFIG.DATA_PROCESSOR = [
        p for p in c.DATA_CONFIG.DATA_PROCESSOR if p.NAME != 'shuffle_points']
    ds, _ = build_dataloader(c.DATA_CONFIG, c.CLASS_NAMES, batch_size=2,
                             training=True, num_scenes=8)
    return ds


def _collect(loader):
    return list(loader)


def test_worker_batches_match_serial(dataset):
    serial = DataLoader(dataset, batch_size=2, shuffle=True, seed=3,
                        num_workers=0, prefetch=0)
    pooled = DataLoader(dataset, batch_size=2, shuffle=True, seed=3,
                        num_workers=2)
    serial.set_epoch(1)
    pooled.set_epoch(1)
    a, b = _collect(serial), _collect(pooled)
    assert len(a) == len(b) == 4
    for ba, bb in zip(a, b):
        assert set(ba.keys()) == set(bb.keys())
        np.testing.assert_array_equal(ba['frame_id'], bb['frame_id'])
        # no augmentation/shuffle in this config -> bit-identical tensors
        np.testing.assert_array_equal(ba['voxels'], bb['voxels'])
        np.testing.assert_array_equal(ba['gt_boxes'], bb['gt_boxes'])


def test_worker_pool_multiple_epochs(dataset):
    pooled = DataLoader(dataset, batch_size=2, shuffle=True, seed=0,
                        num_workers=2)
    pooled.set_epoch(0)
    e0 = [b['frame_id'].tolist() for b in pooled]
    pooled.set_epoch(1)
    e1 = [b['frame_id'].tolist() for b in pooled]
    assert len(e0) == len(e1) == 4
    assert e0 != e1  # reshuffled across epochs
    flat = sorted(x for b in e0 for x in b)
    assert flat == sorted(x for b in e1 for x in b)  # same sample universe
