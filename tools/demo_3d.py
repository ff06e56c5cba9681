"""Interactive 3D inference viewer (mirrors tools/demo_3d.py:19-121).

Steps through a folder of point clouds (or synthetic scenes), runs the
jitted detector, and shows predictions as wireframe boxes over the cloud in
the vispy LaserDetVis viewer (n/b = next/back, i = intensity colors,
q = quit). Without vispy (headless TPU pod) use --offscreen to write one
PNG per scene via the matplotlib fallback instead.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='3D inference viewer')
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/second.yaml')
    parser.add_argument('--data_path', type=str, default=None,
                        help='point cloud file or directory of .bin/.npy')
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--ckpt', type=str, default=None,
                        help='checkpoint dir/path; omit for random weights')
    parser.add_argument('--synthetic', action='store_true',
                        help='view generated synthetic scenes')
    parser.add_argument('--num_scenes', type=int, default=8)
    parser.add_argument('--offscreen', action='store_true',
                        help='render PNGs instead of the live vispy window')
    parser.add_argument('--save_dir', type=str, default='demo_3d_out')
    parser.add_argument('--score_thresh', type=float, default=0.3)
    parser.add_argument('--cpu', action='store_true')
    return parser.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.datasets.dataset import DatasetTemplate
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
        template, loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
            num_scenes=args.num_scenes)
        samples = list(loader)
    else:
        from demo import DemoDataset
        template = DatasetTemplate(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                   training=False, root_path=args.data_path,
                                   logger=logger)
        demo_set = DemoDataset(template, args.data_path, ext=args.ext)
        samples = [DatasetTemplate.collate_batch([demo_set[i]])
                   for i in range(len(demo_set))]
    if not samples:
        raise SystemExit('no input scenes')
    logger.info('%d scenes; devices: %s', len(samples), jax.devices())

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          template.dataset_info)
    variables = jit_init(model, device_batch(samples[0]))
    if args.ckpt and args.ckpt != 'none':
        import optax

        from lidardetection_tpu.parallel.train_step import TrainState
        from lidardetection_tpu.utils.checkpoint import restore_checkpoint
        state = TrainState.create(variables['params'], variables['batch_stats'],
                                  optax.identity())
        state, _ = restore_checkpoint(args.ckpt, state, logger)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    step = make_eval_step(model, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))

    def infer(idx):
        batch = samples[idx % len(samples)]
        preds = step(variables['params'], variables['batch_stats'],
                     device_batch(batch))
        n = int(preds['num_preds'][0])
        boxes = np.asarray(preds['pred_boxes'][0][:n])
        scores = np.asarray(preds['pred_scores'][0][:n])
        labels = np.asarray(preds['pred_labels'][0][:n])
        keep = scores >= args.score_thresh
        pts = np.asarray(batch['points'][0])
        if 'num_points' in batch:
            pts = pts[:int(batch['num_points'][0])]
        logger.info('scene %d: %d/%d detections above %.2f',
                    idx % len(samples), int(keep.sum()), n, args.score_thresh)
        return pts, boxes[keep], scores[keep], labels[keep]

    if args.offscreen:
        from visual_utils.laserdetvis import LaserDetVis
        out = Path(args.save_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i in range(len(samples)):
            pts, boxes, scores, labels = infer(i)
            LaserDetVis.render_offscreen(
                pts, boxes=boxes, scores=scores, labels=labels,
                save_path=str(out / f'scene_{i:04d}.png'))
        logger.info('wrote %d PNGs to %s', len(samples), out)
        return

    from visual_utils.laserdetvis import LaserDetVis
    vis = LaserDetVis()
    offset = {'i': 0}

    def show():
        pts, boxes, _, labels = infer(offset['i'])
        vis.update(pts, boxes=boxes, labels=labels)

    def on_next():
        offset['i'] += 1
        show()

    def on_back():
        offset['i'] -= 1
        show()

    vis.on_next, vis.on_back = on_next, on_back
    print('To navigate:\n\tb: back\n\tn: next\n\ti: intensity colors\n\tq: quit')
    show()
    vis.run()
    logger.info('demo_3d done.')


if __name__ == '__main__':
    main()
