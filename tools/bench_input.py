"""Host input-pipeline ingest benchmark.

Measures collated batches/s (and scans/s) of the DataLoader with the full
train-time host path — augmentation + voxelization + collate — for the
serial thread prefetcher and for N-worker process pools. The reference
counterpart is torch DataLoader(num_workers) (pcdet/datasets/__init__.py:
60-70); the acceptance bar (VERDICT r1) is ingest >= 2x the chip's train
step rate at the same batch size.

    python tools/bench_input.py --batch_size 32 --workers 0 4 8
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file',
                    default='tools/cfgs/kitti_models/pointpillar.yaml')
    ap.add_argument('--batch_size', type=int, default=32)
    ap.add_argument('--num_scenes', type=int, default=64)
    ap.add_argument('--batches', type=int, default=16)
    ap.add_argument('--workers', type=int, nargs='+', default=[0, 4])
    ap.add_argument('--augment', action='store_true', default=True)
    ap.add_argument('--no_augment', dest='augment', action='store_false')
    args = ap.parse_args()

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import DataLoader, build_dataloader
    from lidardetection_tpu.utils.common import set_random_seed

    set_random_seed(42)
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    if not args.augment and 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        # gt-sampling needs a database on disk; keep the geometric augs
        cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST = [
            a for a in cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST
            if a.NAME != 'gt_sampling']

    dataset, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=True, num_scenes=args.num_scenes)

    for nw in args.workers:
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=True, num_workers=nw)
        n = 0
        it = iter(loader)
        next(it)  # warm (worker spawn, page-in)
        t0 = time.perf_counter()
        for batch in it:
            n += 1
            if n >= args.batches:
                break
        dt = time.perf_counter() - t0
        print(json.dumps({
            'metric': 'input_scans_per_sec',
            'workers': nw,
            'value': round(n * args.batch_size / dt, 2),
            'batches_per_sec': round(n / dt, 3),
            'batch_size': args.batch_size,
            'augment': bool(args.augment and 'DATA_AUGMENTOR' in cfg.DATA_CONFIG),
        }), flush=True)


if __name__ == '__main__':
    main()
