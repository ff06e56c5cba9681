"""Localize the PV-RCNN refinement inversion: does the RCNN head improve
or degrade box IoU on (a) the sampled TRAIN rois it is optimized on and
(b) the eval-NMS rois it is applied to?

Motivation (TRAIN_TO_AP.md): on the 48-scene overfit harness, roi
recall@0.7 >> rcnn recall@0.7 in BOTH bf16 and f32 — the learned
refinement makes near-perfect proposals WORSE. Two candidate causes with
opposite fixes:
  - train-roi IoU also degrades  -> the reg/target path is wrong (bug);
  - train-roi IoU improves       -> distribution shift: the head trained
    on 0.55-0.8-IoU sampled rois overcorrects the 0.95-IoU eval rois
    (harness dynamic, fix sampler mix).
Prints per-class mean IoU before/after refinement for both roi sets.

Usage:
    python tools/probe_rcnn_refine.py \
        --ckpt_dir output/train_to_ap_pvrcnn_f32/ckpt --compute_dtype float32
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='tools/cfgs/kitti_models/pv_rcnn.yaml')
    ap.add_argument('--ckpt_dir', default='output/train_to_ap_pvrcnn_f32/ckpt')
    ap.add_argument('--compute_dtype', default='float32')
    ap.add_argument('--scenes', type=int, default=48)
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--batches', type=int, default=2)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.core.iou3d import boxes_iou3d
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.models.roi_heads import roi_head_utils
    from lidardetection_tpu.core.box_coders import build_box_coder
    from lidardetection_tpu.parallel.train_step import (
        TrainState, device_batch, jit_init,
    )
    from lidardetection_tpu.utils.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )
    from lidardetection_tpu.utils.common import create_logger, set_random_seed
    from lidardetection_tpu.utils.optimization import build_optimizer

    set_random_seed(42)
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.MODEL.COMPUTE_DTYPE = args.compute_dtype
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR
    # half_res surgery identical to tools/train_to_ap.py
    pc = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            vs = p.VOXEL_SIZE
            p.VOXEL_SIZE = [vs[0] * 2, vs[1] * 2, vs[2]]
            three_d = float(vs[2]) < float(pc[5]) - float(pc[2])
            cap = 24000 if three_d else 8000
            p.MAX_NUMBER_OF_VOXELS = {'train': cap, 'test': cap}

    logger = create_logger(None)
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=True, logger=logger, num_scenes=args.scenes, seed=0,
        model_cfg=cfg.MODEL)
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    batch0 = next(iter(loader))
    variables = jit_init(model, device_batch(batch0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 2)
    state = TrainState.create(params=variables['params'],
                              batch_stats=variables['batch_stats'], tx=tx)
    ckpt = latest_checkpoint(args.ckpt_dir)
    if ckpt is None:
        sys.exit(f'no checkpoint in {args.ckpt_dir}')
    restored, ep = restore_checkpoint(ckpt, state, logger)
    print(f'# restored epoch {ep}', file=sys.stderr)

    # Precise-BN recalibration: the roi/rcnn recall gap this probe is
    # diagnosing was measured with recalibrated population stats
    # (train_to_ap.py applies it between restore and eval); probing with
    # the raw, lagging momentum-0.01 EMAs would introduce a BN-stats
    # confound that alone can fake the train-improves/eval-degrades
    # signature. Recalibrate first, and use the same stats for both
    # branches.
    from lidardetection_tpu.engine.bn_recalibrate import recalibrate_bn_stats
    ev = recalibrate_bn_stats(
        model, {'params': restored.params,
                'batch_stats': restored.batch_stats},
        loader, device_batch, n_batches=len(loader), logger=logger)
    params, stats = ev['params'], ev['batch_stats']

    tc = cfg.MODEL.ROI_HEAD.TARGET_CONFIG
    box_coder = build_box_coder(tc['BOX_CODER'],
                                **dict(tc.get('BOX_CODER_CONFIG', {})))

    @jax.jit
    def probe_train(db, step_i):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), step_i)
        rngs = {'proposal': jax.random.fold_in(rng, 1),
                'dropout': jax.random.fold_in(rng, 2)}
        out, _ = model.apply({'params': params, 'batch_stats': stats},
                             db, training=True, mutable=['batch_stats'],
                             rngs=rngs)
        fwd = out['roi_head_fwd']
        rois = fwd['rois']                       # (B, R, 7+)
        gt_src = fwd['gt_of_rois_src']           # (B, R, 8) [box7, cls]
        _, refined = roi_head_utils.generate_rcnn_boxes(
            rois, fwd['rcnn_cls'], fwd['rcnn_reg'], box_coder)

        def per_sample(roi_b, ref_b, gt_b):
            iou_before = jnp.diagonal(
                boxes_iou3d(roi_b[:, :7], gt_b[:, :7]))
            iou_after = jnp.diagonal(
                boxes_iou3d(ref_b[:, :7], gt_b[:, :7]))
            return iou_before, iou_after

        ib, ia = jax.vmap(per_sample)(rois, refined, gt_src)
        return (ib, ia, fwd['gt_iou_of_rois'], fwd['reg_valid_mask'],
                fwd['roi_labels'])

    @jax.jit
    def probe_eval(db):
        out = model.apply({'params': params, 'batch_stats': stats},
                          db, training=False)
        rois = out['rois']                      # (B, R, 7)
        refined = out['batch_box_preds']        # (B, R, 7)
        gts = db['gt_boxes']                    # (B, G, 8)

        def per_sample(roi_b, ref_b, gt_b):
            valid = gt_b[:, -1] > 0
            iou_roi = boxes_iou3d(roi_b[:, :7], gt_b[:, :7])
            iou_roi = jnp.where(valid[None, :], iou_roi, 0.0)
            best_gt = jnp.argmax(iou_roi, axis=1)
            before = jnp.max(iou_roi, axis=1)
            iou_ref = boxes_iou3d(ref_b[:, :7], gt_b[:, :7])
            iou_ref = jnp.where(valid[None, :], iou_ref, 0.0)
            after = jnp.take_along_axis(
                iou_ref, best_gt[:, None], axis=1)[:, 0]
            lbl = gt_b[best_gt, -1].astype(jnp.int32)
            return before, after, lbl

        return jax.vmap(per_sample)(rois, refined, gts)

    names = {i + 1: n for i, n in enumerate(cfg.CLASS_NAMES)}
    tr = {c: ([], []) for c in names}
    ev = {c: ([], []) for c in names}
    it = iter(loader)
    for bi in range(args.batches):
        db = device_batch(next(it))
        ib, ia, gt_iou, rv, lbl = map(np.asarray, probe_train(db, bi))
        fg = rv.reshape(-1) > 0
        for c in names:
            m = fg & (lbl.reshape(-1) == c)
            if m.any():
                tr[c][0].extend(ib.reshape(-1)[m])
                tr[c][1].extend(ia.reshape(-1)[m])
        b, a, l = map(np.asarray, probe_eval(db))
        good = b.reshape(-1) > 0.55  # match the train fg regime
        for c in names:
            m = good & (l.reshape(-1) == c)
            if m.any():
                ev[c][0].extend(b.reshape(-1)[m])
                ev[c][1].extend(a.reshape(-1)[m])

    print(f'{"class":<12} {"set":<6} {"n":>5} {"iou_before":>10} '
          f'{"iou_after":>10} {"delta":>8}')
    for c, n in names.items():
        for tag, d in (('train', tr), ('eval', ev)):
            if d[c][0]:
                mb = float(np.mean(d[c][0]))
                ma = float(np.mean(d[c][1]))
                print(f'{n:<12} {tag:<6} {len(d[c][0]):>5} {mb:>10.3f} '
                      f'{ma:>10.3f} {ma - mb:>+8.3f}')


if __name__ == '__main__':
    main()
