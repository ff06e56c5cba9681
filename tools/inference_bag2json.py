"""Bag/folder inference -> detections + tracking -> JSON
(mirrors tools/inference_bag2json.py:1-198).

With rosbag installed and --bag_file given, streams the bag through
BagMultiframeDatasetUnifyLidar; otherwise runs over a folder of .bin clouds
(DemoDataset) or synthetic scenes. Writes one JSON per run with per-frame
detections and tracked objects.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg_file', type=str,
                   default='tools/cfgs/kitti_models/pointpillar.yaml')
    p.add_argument('--bag_file', type=str, default=None)
    p.add_argument('--data_path', type=str, default=None)
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--num_scenes', type=int, default=8)
    p.add_argument('--output', type=str, default='output/detections.json')
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()
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
    from lidardetection_tpu.utils.tracker_for_inference import TrackingManager

    logger = create_logger()
    cfg = cfg_from_yaml_file(args.cfg_file)

    if args.bag_file:
        from lidardetection_tpu.datasets.plusai.plusai_bag_dataset import (
            BagMultiframeDatasetUnifyLidar,
        )
        stream = BagMultiframeDatasetUnifyLidar(
            cfg.DATA_CONFIG, args.bag_file, cfg.CLASS_NAMES)
        def frames():
            for ts, pose, sample in stream:
                yield ts, stream.collate_batch([sample])
        dataset = stream
    elif args.data_path:
        from lidardetection_tpu.datasets.plusai.plusai_bag_dataset import DemoDataset
        dataset = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                              root_path=args.data_path)
        def frames():
            for i in range(len(dataset)):
                yield float(i) * 0.1, dataset.collate_batch([dataset[i]])
    else:
        cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
        if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
            del cfg.DATA_CONFIG.DATA_AUGMENTOR
        dataset, loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
            num_scenes=args.num_scenes)
        def frames():
            for i, batch in enumerate(loader):
                yield float(i) * 0.1, batch

    first_ts, batch0 = next(frames())
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
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
    tracker = TrackingManager({'CLASS_NAMES': cfg.CLASS_NAMES})

    results = []
    for ts, batch in frames():
        preds = jax.device_get(step(variables['params'],
                                    variables['batch_stats'],
                                    device_batch(batch)))
        tracked = tracker.update_tracking(preds)
        n = int(preds['num_preds'][0])
        results.append({
            'timestamp': ts,
            'detections': [
                {'box': np.asarray(preds['pred_boxes'][0][k]).tolist(),
                 'score': float(preds['pred_scores'][0][k]),
                 'label': int(preds['pred_labels'][0][k])}
                for k in range(n)
            ],
            'tracked_objects': [
                {'id': int(tracked['object_ids'][k]),
                 'type': int(tracked['object_types'][k]),
                 'box': tracked['pred_boxes'][k].tolist()}
                for k in range(len(tracked['object_ids']))
            ],
        })
        logger.info('t=%.2f: %d detections, %d tracks', ts, n,
                    len(tracked['object_ids']))

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, 'w') as f:
        json.dump(results, f, indent=1)
    logger.info('wrote %s (%d frames)', args.output, len(results))


if __name__ == '__main__':
    main()
