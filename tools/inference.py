"""Offline scene inference + BEV plot (mirrors tools/inference.py).

Runs a detector over synthetic scenes or a folder of .bin clouds, optionally
tracking across frames (TrackingManager), and writes BEV PNGs.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg_file', type=str,
                   default='tools/cfgs/kitti_models/pointpillar.yaml')
    p.add_argument('--data_path', type=str, default=None,
                   help='directory of .bin clouds; omit for synthetic scenes')
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--num_scenes', type=int, default=4)
    p.add_argument('--output_dir', type=str, default='output/inference')
    p.add_argument('--with_tracking', action='store_true')
    p.add_argument('--cpu', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.train_step import (
        device_batch, jit_init, make_eval_step,
    )
    from lidardetection_tpu.utils.common import create_logger
    from lidardetection_tpu.utils.data_viz import plot_gt_det_cmp

    logger = create_logger()
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        num_scenes=args.num_scenes)

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    batch0 = next(iter(loader))
    variables = jit_init(model, device_batch(batch0))
    if args.ckpt and args.ckpt != 'none':
        import optax

        from lidardetection_tpu.parallel.train_step import TrainState
        from lidardetection_tpu.utils.checkpoint import restore_checkpoint
        state = TrainState.create(variables['params'], variables['batch_stats'],
                                  optax.identity())
        state, _ = restore_checkpoint(args.ckpt, state, logger)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    step = make_eval_step(model, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))
    tracker = None
    if args.with_tracking:
        from lidardetection_tpu.utils.tracker_for_inference import TrackingManager
        tracker = TrackingManager({'CLASS_NAMES': cfg.CLASS_NAMES})

    bev_range = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    for i, batch in enumerate(loader):
        preds = jax.device_get(step(variables['params'],
                                    variables['batch_stats'],
                                    device_batch(batch)))
        n = int(preds['num_preds'][0])
        det_boxes = preds['pred_boxes'][0][:n]
        logger.info('frame %d: %d detections', i, n)
        if tracker is not None:
            tracked = tracker.update_tracking(preds)
            logger.info('  %d active tracks', len(tracked['object_ids']))
        npts = int(batch['num_points'][0])
        path = plot_gt_det_cmp(
            batch['points'][0][:npts, :3],
            batch['gt_boxes'][0][batch['gt_boxes'][0, :, -1] > 0]
            if 'gt_boxes' in batch else None,
            det_boxes, bev_range, name=f'inference_{i:04d}',
            save_dir=args.output_dir,
            det_scores=preds['pred_scores'][0][:n])
        logger.info('  BEV plot: %s', path)


if __name__ == '__main__':
    main()
