"""Clip inference -> BEV video (mirrors tools/inference_video.py:18-100).

Writes an .avi via cv2.VideoWriter from fast uint8 BEV canvases
(data_viz.bev_canvas), like the reference; `--output *.gif` instead
assembles the frames into an animated GIF with PIL (headless-friendly).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg_file', type=str,
                   default='tools/cfgs/kitti_models/pointpillar.yaml')
    p.add_argument('--data_path', type=str, default=None,
                   help='directory of .bin clouds; omit for synthetic scenes')
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--num_scenes', type=int, default=8)
    p.add_argument('--output', type=str, default='output/inference_video.avi')
    p.add_argument('--fps', type=int, default=5)
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
    from lidardetection_tpu.utils.data_viz import bev_canvas

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

    frames = []
    bev_range = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    for i, batch in enumerate(loader):
        preds = jax.device_get(step(variables['params'],
                                    variables['batch_stats'],
                                    device_batch(batch)))
        n = int(preds['num_preds'][0])
        npts = int(batch['num_points'][0])
        frames.append(bev_canvas(
            batch['points'][0][:npts], preds['pred_boxes'][0][:n],
            bev_range, scores=preds['pred_scores'][0][:n],
            labels=preds['pred_labels'][0][:n], info=f'frame {i}'))
        logger.info('frame %d: %d detections', i, n)

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    h, w = frames[0].shape[:2]
    if args.output.endswith('.gif'):
        from PIL import Image
        imgs = [Image.fromarray(f[..., ::-1]).convert('P') for f in frames]
        imgs[0].save(args.output, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / args.fps), loop=0)
    else:
        import cv2
        writer = cv2.VideoWriter(args.output,
                                 cv2.VideoWriter_fourcc(*'MJPG'),
                                 args.fps, (w, h))
        for f in frames:
            writer.write(f)
        writer.release()
    logger.info('video written: %s (%d frames)', args.output, len(frames))


if __name__ == '__main__':
    main()
