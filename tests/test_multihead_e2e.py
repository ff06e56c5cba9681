"""AnchorHeadMulti (CBGS-style) e2e on synthetic scenes: 2 head groups over
3 classes, separate per-term reg convs, sincos coder, multi-class NMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.config import CfgNode, cfg_from_yaml_file
from lidardetection_tpu.datasets import build_dataloader
from lidardetection_tpu.models import build_network
from lidardetection_tpu.parallel.train_step import (
    TrainState, device_batch, make_eval_step, make_train_step,
)
from lidardetection_tpu.utils.optimization import build_optimizer


def _anchor(name, sizes, height, matched, unmatched):
    return {
        'class_name': name, 'anchor_sizes': [sizes],
        'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [height],
        'align_center': False, 'feature_map_stride': 2,
        'matched_threshold': matched, 'unmatched_threshold': unmatched,
    }


@pytest.fixture(scope='module')
def cfg():
    c = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    c.DATA_CONFIG.MAX_POINTS = 16000
    c.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {'train': 3000, 'test': 3000}
    c.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.32, 0.32, 4]
    c.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del c.DATA_CONFIG.DATA_AUGMENTOR
    c.MODEL.COMPUTE_DTYPE = 'float32'
    c.MODEL.DENSE_HEAD = CfgNode({
        'NAME': 'AnchorHeadMulti',
        'CLASS_AGNOSTIC': False,
        'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'USE_DIRECTION_CLASSIFIER': True,
        'USE_MULTIHEAD': True,
        'SEPARATE_MULTIHEAD': True,
        'ANCHOR_GENERATOR_CONFIG': [
            _anchor('Car', [3.9, 1.6, 1.56], -1.78, 0.6, 0.45),
            _anchor('Pedestrian', [0.8, 0.6, 1.73], -0.6, 0.5, 0.35),
            _anchor('Cyclist', [1.76, 0.6, 1.73], -0.6, 0.5, 0.35),
        ],
        'SHARED_CONV_NUM_FILTER': 32,
        'RPN_HEAD_CFGS': [
            {'HEAD_CLS_NAME': ['Car']},
            {'HEAD_CLS_NAME': ['Pedestrian', 'Cyclist']},
        ],
        'SEPARATE_REG_CONFIG': {
            'NUM_MIDDLE_CONV': 1, 'NUM_MIDDLE_FILTER': 32,
            'REG_LIST': ['reg:2', 'height:1', 'size:3', 'angle:2'],
        },
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder',
            'BOX_CODER_CONFIG': {'code_size': 7,
                                 'encode_angle_by_sincos': True},
        },
        'LOSS_CONFIG': {
            'REG_LOSS_TYPE': 'WeightedL1Loss',
            'LOSS_WEIGHTS': {
                'pos_cls_weight': 1.0, 'neg_cls_weight': 2.0,
                'cls_weight': 1.0, 'loc_weight': 0.25, 'dir_weight': 0.2,
                'code_weights': [1.0] * 8,
            },
        },
    })
    c.MODEL.POST_PROCESSING.NMS_CONFIG.MULTI_CLASSES_NMS = True
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 256
    c.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    return c


@pytest.fixture(scope='module')
def setup(cfg):
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
        num_scenes=2)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, 3, cfg.CLASS_NAMES, dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), device_batch(batch),
                           training=False)
    return dataset, batch, model, variables


def test_forward_multihead(cfg, setup):
    dataset, batch, model, variables = setup
    out = model.apply(variables, device_batch(batch), training=False)
    # anchors per class = 2 rot x (124*108 grid); 3 classes total
    a_total = 124 * 108 * 2 * 3
    assert out['batch_box_preds'].shape == (2, a_total, 7)
    assert isinstance(out['batch_cls_preds'], (list, tuple))
    assert out['batch_cls_preds'][0].shape[-1] == 1  # car head
    assert out['batch_cls_preds'][1].shape[-1] == 2  # ped+cyc head
    assert out['multihead_label_mapping'] == ((1,), (2, 3))


def test_train_step_loss_decreases(cfg, setup):
    dataset, batch, model, variables = setup
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 4)
    fresh = jax.tree.map(jnp.copy, variables)
    state = TrainState.create(fresh['params'], fresh['batch_stats'], tx)
    step = make_train_step(model)
    db = device_batch(batch)
    losses = []
    for _ in range(6):
        state, tb = step(state, db)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_multiclass_nms_postprocess(cfg, setup):
    dataset, batch, model, variables = setup
    eval_step = make_eval_step(model, cfg.MODEL.POST_PROCESSING, 3)
    preds = eval_step(variables['params'], variables['batch_stats'],
                      device_batch(batch))
    # 3 classes x 16 post-max slots across the heads
    assert preds['pred_boxes'].shape == (2, 3 * 16, 7)
    labels = np.asarray(preds['pred_labels'])
    mask = np.asarray(preds['pred_mask'])
    assert set(np.unique(labels[mask])) <= {1, 2, 3}
