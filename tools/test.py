"""Evaluation CLI (mirrors tools/test.py:134-199).

Evaluates one checkpoint, or with --eval_all watches the ckpt dir and
evaluates every new checkpoint as training produces them (test.py:97-131).
"""

import argparse
import datetime
import glob
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_config():
    parser = argparse.ArgumentParser(description='evaluate a detector')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true')
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--max_waiting_mins', type=float, default=30)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--num_scenes', type=int, default=16)
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    from lidardetection_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import optax

    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.engine.evaluator import eval_one_epoch
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.mesh import make_mesh
    from lidardetection_tpu.parallel.train_step import (
        TrainState, device_batch, jit_init,
    )
    from lidardetection_tpu.utils.checkpoint import restore_checkpoint
    from lidardetection_tpu.utils.common import create_logger

    n_dev = len(jax.devices())
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * n_dev
    output_dir = Path('output') / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(eval_dir / f'log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt')

    if args.synthetic:
        cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
        if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
            del cfg.DATA_CONFIG.DATA_AUGMENTOR
        extra = {'num_scenes': args.num_scenes}
    else:
        extra = {}

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=False, logger=logger, model_cfg=cfg.MODEL, **extra)
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    batch0 = next(iter(loader))
    variables = jit_init(model, device_batch(batch0))
    mesh = make_mesh() if n_dev > 1 else None

    def eval_ckpt(ckpt_path, tag):
        nonlocal variables
        if ckpt_path:
            state = TrainState.create(variables['params'],
                                      variables['batch_stats'], optax.identity())
            state, _ = restore_checkpoint(ckpt_path, state, logger)
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
        logger.info('==> evaluating %s', ckpt_path or 'random init')
        eval_one_epoch(model, variables, loader, cfg.MODEL.POST_PROCESSING,
                       cfg.CLASS_NAMES, logger, mesh=mesh,
                       result_dir=str(eval_dir / tag))

    if not args.eval_all:
        eval_ckpt(args.ckpt, 'single')
        return

    ckpt_dir = args.ckpt_dir or str(output_dir / 'ckpt')
    evaluated = set()
    wait_start = time.time()
    while True:
        ckpts = sorted(
            glob.glob(f'{ckpt_dir}/checkpoint_epoch_*'),
            key=lambda f: int(re.findall(r'checkpoint_epoch_(\d+)', f)[0]))
        new = [c for c in ckpts if c not in evaluated]
        if not new:
            if time.time() - wait_start > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            continue
        for c in new:
            epoch = re.findall(r'checkpoint_epoch_(\d+)', c)[0]
            eval_ckpt(c, f'epoch_{epoch}')
            evaluated.add(c)
        wait_start = time.time()


if __name__ == '__main__':
    main()
