"""Clip inference -> animated BEV GIF (mirrors tools/inference_video.py).

The reference writes an .avi via cv2; headless here: per-frame BEV PNGs are
assembled into an animated GIF with PIL.
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
    p.add_argument('--output', type=str, default='output/inference_video.gif')
    p.add_argument('--fps', type=int, default=5)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    from PIL import Image

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.train_step import device_batch, make_eval_step
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
    variables = model.init(jax.random.PRNGKey(0), device_batch(batch0),
                           training=False)
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
    out_dir = Path(args.output).parent / 'video_frames'
    for i, batch in enumerate(loader):
        preds = jax.device_get(step(variables['params'],
                                    variables['batch_stats'],
                                    device_batch(batch)))
        n = int(preds['num_preds'][0])
        npts = int(batch['num_points'][0])
        path = plot_gt_det_cmp(
            batch['points'][0][:npts, :3], None,
            preds['pred_boxes'][0][:n], bev_range,
            name=f'frame_{i:04d}', save_dir=str(out_dir),
            det_scores=preds['pred_scores'][0][:n])
        frames.append(Image.open(path).convert('P'))
        logger.info('frame %d: %d detections', i, n)

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(args.output, save_all=True, append_images=frames[1:],
                   duration=int(1000 / args.fps), loop=0)
    logger.info('video written: %s (%d frames)', args.output, len(frames))


if __name__ == '__main__':
    main()
