"""Quick inference demo (mirrors tools/demo.py:16-106).

Runs a detector over a folder of point clouds (.bin/.npy) — or procedurally
generated synthetic scenes with --synthetic — and prints/saves predictions.
Visualization is BEV matplotlib-free text summary (the reference's mayavi
viewer has no headless TPU-pod analog; use tools/visualize.py for BEV PNGs).
"""

import argparse
import glob
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='lidardetection_tpu demo')
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/pointpillar.yaml')
    parser.add_argument('--data_path', type=str, default=None,
                        help='point cloud file or directory of .bin/.npy')
    parser.add_argument('--synthetic', action='store_true',
                        help='run on generated synthetic scenes')
    parser.add_argument('--num_scenes', type=int, default=4)
    parser.add_argument('--ckpt', type=str, default=None,
                        help='checkpoint dir/path; omit for random weights')
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--cpu', action='store_true', help='force CPU backend')
    return parser.parse_args()


class DemoDataset:
    """Folder-of-clouds dataset (tools/demo.py:16-47 DemoDataset)."""

    def __init__(self, template, data_path, ext='.bin'):
        self.template = template
        p = Path(data_path)
        self.files = sorted(glob.glob(str(p / f'*{ext}'))) if p.is_dir() else [str(p)]
        self.ext = ext

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        f = self.files[index]
        if self.ext == '.bin':
            points = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        elif self.ext == '.npy':
            points = np.load(f)
        else:
            raise NotImplementedError(self.ext)
        return self.template.prepare_data({'points': points, 'frame_id': index})


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

    logger = create_logger()
    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.synthetic or args.data_path is None:
        cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
        if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
            del cfg.DATA_CONFIG.DATA_AUGMENTOR
        dataset, loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
            num_scenes=args.num_scenes)
    else:
        # folder-of-clouds mode (tools/demo.py:16-47): feed raw .bin/.npy
        # files through the eval-side prepare_data pipeline
        from lidardetection_tpu.datasets.dataset import DatasetTemplate
        template = DatasetTemplate(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                   training=False, root_path=args.data_path,
                                   logger=logger)
        demo_set = DemoDataset(template, args.data_path, ext=args.ext)
        if not len(demo_set):
            raise SystemExit(f'no *{args.ext} files under {args.data_path}')

        class _Loader:
            dataset = template

            def __iter__(self):
                for i in range(len(demo_set)):
                    yield DatasetTemplate.collate_batch([demo_set[i]])

        dataset, loader = template, _Loader()

    logger.info('devices: %s', jax.devices())
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    batch0 = next(iter(loader))
    variables = jit_init(model, device_batch(batch0))
    if args.ckpt and args.ckpt != 'none':
        from lidardetection_tpu.parallel.train_step import TrainState
        from lidardetection_tpu.utils.checkpoint import restore_checkpoint
        import optax
        state = TrainState.create(variables['params'], variables['batch_stats'],
                                  optax.identity())
        state, _ = restore_checkpoint(args.ckpt, state, logger)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    step = make_eval_step(model, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))
    for i, batch in enumerate(loader):
        t0 = time.perf_counter()
        preds = step(variables['params'], variables['batch_stats'],
                     device_batch(batch))
        jax.block_until_ready(preds['pred_boxes'])
        dt = time.perf_counter() - t0
        n = int(preds['num_preds'][0])
        logger.info('scene %d: %d detections (%.1f ms)', i, n, dt * 1e3)
        boxes = np.asarray(preds['pred_boxes'][0][:n])
        scores = np.asarray(preds['pred_scores'][0][:n])
        labels = np.asarray(preds['pred_labels'][0][:n])
        for b, s, l in list(zip(boxes, scores, labels))[:10]:
            name = cfg.CLASS_NAMES[int(l) - 1]
            logger.info('  %-10s score=%.3f xyz=(%.1f, %.1f, %.1f) '
                        'lwh=(%.1f, %.1f, %.1f) ry=%.2f',
                        name, s, *b[:6], b[6])
        if 'gt_boxes' in batch:
            ng = int((batch['gt_boxes'][0, :, -1] > 0).sum())
            logger.info('  (scene has %d gt boxes)', ng)
    logger.info('demo done.')


if __name__ == '__main__':
    main()
