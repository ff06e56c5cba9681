"""A/B the TPU approximation knobs against exact semantics on a trained
overfit checkpoint (the PV-RCNN train_to_ap output).

The PV-RCNN path runs three config-gated TPU approximations (sector FPS,
grid-bucketed ball query with cell caps, approx top-k recall) plus the
candidate-capped RoI grid pool. This harness evaluates ONE trained
checkpoint under each knob setting and prints the per-class AP deltas —
the measured cost of every approximation, no faith required.

    python tools/ablate_approx.py --ckpt_dir output/train_to_ap_pvrcnn/ckpt
"""

import argparse
import datetime
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = [
    # (name, MODEL-cfg overrides) — brute-force ball-query variants last:
    # the M x N scan is memory-hungry and must not take the rest down
    ('shipping', {}),
    # eval-time precision A/B: run the same checkpoint's eval in f32.
    # Separates eval-side bf16 rounding from train-side effects (the
    # train_to_ap --compute_dtype f32 run covers the latter).
    ('eval_f32', {'COMPUTE_DTYPE': 'float32'}),
    ('exact_fps', {'FPS_SECTORS': 1}),
    ('wide_roi_candidates', {'__ROI_CANDIDATE_CAP__': 256}),
    ('exact_ball_query', {'BALL_QUERY_GRID_CELL_CAP': 0,
                          'BALL_QUERY_APPROX_RECALL': None}),
    ('all_exact', {'FPS_SECTORS': 1, 'BALL_QUERY_GRID_CELL_CAP': 0,
                   'BALL_QUERY_APPROX_RECALL': None,
                   '__ROI_CANDIDATE_CAP__': 256}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file',
                    default='tools/cfgs/kitti_models/pv_rcnn.yaml')
    ap.add_argument('--ckpt_dir', default='output/train_to_ap_pvrcnn/ckpt')
    ap.add_argument('--scenes', type=int, default=48)
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--half_res', action='store_true', default=True)
    ap.add_argument('--variants', default=','.join(n for n, _ in VARIANTS))
    ap.add_argument('--output_dir', default='output/ablate_approx')
    args = ap.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.engine.bn_recalibrate import recalibrate_bn_stats
    from lidardetection_tpu.engine.evaluator import eval_one_epoch
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.train_step import (
        TrainState, device_batch, jit_init,
    )
    from lidardetection_tpu.utils.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )
    from lidardetection_tpu.utils.common import create_logger, set_random_seed
    from lidardetection_tpu.utils.optimization import build_optimizer

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        out / f'log_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt')

    def make_cfg(overrides):
        cfg = cfg_from_yaml_file(args.cfg_file)
        cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
        if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
            del cfg.DATA_CONFIG.DATA_AUGMENTOR
        if args.half_res:
            pc = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
            for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
                if p.NAME == 'transform_points_to_voxels':
                    vs = p.VOXEL_SIZE
                    p.VOXEL_SIZE = [vs[0] * 2, vs[1] * 2, vs[2]]
                    three_d = float(vs[2]) < float(pc[5]) - float(pc[2])
                    cap = 24000 if three_d else 8000
                    p.MAX_NUMBER_OF_VOXELS = {'train': cap, 'test': cap}
        for k, v in overrides.items():
            if k == '__ROI_CANDIDATE_CAP__':
                cfg.MODEL.ROI_HEAD.ROI_GRID_POOL.CANDIDATE_CAP = v
            else:
                cfg.MODEL[k] = v
        return cfg

    rows = {}
    todo = args.variants.split(',')

    def run_variant(name, overrides):
        set_random_seed(42)
        cfg = make_cfg(overrides)
        dataset, loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
            training=True, logger=logger, num_scenes=args.scenes, seed=0,
            model_cfg=cfg.MODEL)
        model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES),
                              cfg.CLASS_NAMES, dataset.dataset_info)
        batch0 = next(iter(loader))
        variables = jit_init(model, device_batch(batch0))
        tx, _ = build_optimizer(cfg.OPTIMIZATION, 10, 2)
        state = TrainState.create(params=variables['params'],
                                  batch_stats=variables['batch_stats'], tx=tx)
        restored, _ep = restore_checkpoint(
            latest_checkpoint(args.ckpt_dir), state, logger)
        ev = {'params': restored.params, 'batch_stats': restored.batch_stats}
        # per-variant precise BN: the knobs change the forward graph, so
        # population statistics are recomputed under the SAME setting
        ev = recalibrate_bn_stats(model, ev, loader, device_batch,
                                  n_batches=len(loader), logger=logger)
        _ts, test_loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
            training=False, logger=logger, num_scenes=args.scenes, seed=0,
            model_cfg=cfg.MODEL)
        result, _ = eval_one_epoch(
            model, ev, test_loader, cfg.MODEL.POST_PROCESSING,
            cfg.CLASS_NAMES, logger, result_dir=str(out / f'eval_{name}'))
        return {k: round(float(result[k]), 2) for k in sorted(result)
                if 'moderate_R40' in k and '_3d/' in k}

    for name, overrides in VARIANTS:
        if name not in todo:
            continue
        try:
            rows[name] = run_variant(name, overrides)
        except Exception as e:  # keep other variants' verdicts flowing
            rows[name] = {'error': f'{type(e).__name__}: {e}'[:160]}
        logger.info('%s: %s', name, rows[name])
        print(json.dumps({name: rows[name]}), flush=True)

    print(json.dumps({'metric': 'approximation_ablation', 'rows': rows},
                     indent=1))


if __name__ == '__main__':
    main()
