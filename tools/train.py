"""Training CLI (mirrors tools/train.py:21-195).

Single-process, multi-device: data parallelism comes from the jitted step's
GSPMD shardings over the local mesh (no torch.distributed launcher; for
multi-host pods, run one process per host with jax.distributed.initialize).
"""

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_config():
    parser = argparse.ArgumentParser(description='train a detector')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None,
                        help='global batch size (default: cfg per-chip size x n_chips)')
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--ckpt_save_interval', type=int, default=1,
                        help='save a checkpoint every N epochs (the final '
                             'epoch always saves; reference tools/train.py:35)')
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    parser.add_argument('--synthetic', action='store_true',
                        help='train on synthetic scenes (no dataset on disk)')
    parser.add_argument('--num_scenes', type=int, default=64)
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--no_eval', action='store_true')
    parser.add_argument('--num_epochs_to_eval', type=int, default=10,
                        help='after training, also evaluate the checkpoints '
                             'of the last N epochs (reference '
                             'tools/train.py:186-192 repeat_eval_ckpt)')
    parser.add_argument('--profile', action='store_true',
                        help='jax.profiler trace of steps 10-15 into '
                             '<output_dir>/profile (view with xprof)')
    parser.add_argument('--multihost', action='store_true',
                        help='join a multi-process run via '
                             'jax.distributed.initialize (TPU pods '
                             'auto-detect topology; run one process per '
                             'host, e.g. tools/scripts/train_tpu_pod.sh)')
    parser.add_argument('--dist_coordinator', type=str, default=None,
                        help='coordinator addr:port (only needed off-TPU)')
    parser.add_argument('--dist_nprocs', type=int, default=None)
    parser.add_argument('--dist_rank', type=int, default=None)
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

    from lidardetection_tpu.parallel.dist import init_distributed, is_main_process
    if args.multihost or args.dist_coordinator:
        rank, world = init_distributed(args.dist_coordinator,
                                       args.dist_nprocs, args.dist_rank)
    else:
        rank, world = 0, 1

    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.engine.evaluator import eval_one_epoch
    from lidardetection_tpu.engine.trainer import train_model
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.mesh import make_mesh
    from lidardetection_tpu.parallel.train_step import (
        device_batch, jit_init,
    )
    from lidardetection_tpu.utils.common import create_logger, set_random_seed

    set_random_seed(42)
    n_dev = len(jax.devices())  # global device count
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * n_dev
    assert batch_size % n_dev == 0 and batch_size % world == 0
    local_batch = batch_size // world  # this process's loader share
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path('output') / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f'log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt'
    logger = create_logger(log_file)
    logger.info('devices: %s, global batch %d', jax.devices(), batch_size)

    if args.synthetic:
        cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
        if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
            del cfg.DATA_CONFIG.DATA_AUGMENTOR
        extra = {'num_scenes': args.num_scenes}
    else:
        extra = {}

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=local_batch,
        training=True, logger=logger, workers=args.workers,
        num_shards=world, shard_id=rank, model_cfg=cfg.MODEL, **extra)
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    batch0 = next(iter(loader))
    variables = jit_init(model, device_batch(batch0))
    n_params = sum(x.size for x in jax.tree.leaves(variables['params']))
    logger.info('model %s: %.2fM params', cfg.MODEL.NAME, n_params / 1e6)

    tb_writer = None
    if is_main_process():
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(log_dir=str(output_dir / 'tensorboard'))
        except ImportError:
            logger.info('tensorboard writer unavailable; scalars not logged')

    mesh = make_mesh() if n_dev > 1 else None
    state = train_model(model, variables, loader, cfg.OPTIMIZATION, epochs,
                        str(ckpt_dir), logger, mesh=mesh,
                        max_ckpt_save_num=args.max_ckpt_save_num,
                        ckpt_save_interval=args.ckpt_save_interval,
                        tb_writer=tb_writer,
                        profile_dir=str(output_dir / 'profile')
                        if args.profile else None, multihost=world > 1)

    if not args.no_eval:
        test_set, test_loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=local_batch,
            training=False, logger=logger, num_shards=world, shard_id=rank,
            model_cfg=cfg.MODEL, **extra)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        result, _annos = eval_one_epoch(
            model, variables, test_loader, cfg.MODEL.POST_PROCESSING,
            cfg.CLASS_NAMES, logger, mesh=mesh,
            result_dir=str(output_dir / 'eval'))
        if tb_writer is not None and isinstance(result, dict):
            for k, v in result.items():
                if isinstance(v, (int, float)):
                    tb_writer.add_scalar(f'eval/{k}', v, int(state.step))

        # repeat_eval_ckpt: evaluate the saved checkpoints of the last N-1
        # earlier epochs too (the final state was just evaluated above);
        # mirrors the reference's post-training eval of the last 10 epochs
        # (tools/train.py:186-192, test.py:85-131).
        if args.num_epochs_to_eval > 1:
            import glob as _glob
            import re as _re

            import optax

            from lidardetection_tpu.parallel.train_step import TrainState
            from lidardetection_tpu.utils.checkpoint import restore_checkpoint
            ckpts = sorted(
                _glob.glob(str(ckpt_dir / 'checkpoint_epoch_*')),
                key=lambda f: int(_re.findall(r'checkpoint_epoch_(\d+)', f)[0]))
            for ckpt_path in ckpts[-args.num_epochs_to_eval:-1]:
                ep = _re.findall(r'checkpoint_epoch_(\d+)', ckpt_path)[0]
                logger.info('repeat-eval: %s', ckpt_path)
                tmpl = TrainState.create(variables['params'],
                                         variables['batch_stats'],
                                         optax.identity())
                st, _ = restore_checkpoint(ckpt_path, tmpl, logger)
                eval_one_epoch(
                    model,
                    {'params': st.params, 'batch_stats': st.batch_stats},
                    test_loader, cfg.MODEL.POST_PROCESSING, cfg.CLASS_NAMES,
                    logger, mesh=mesh,
                    result_dir=str(output_dir / 'eval' / f'epoch_{ep}'))
    if tb_writer is not None:
        tb_writer.close()


if __name__ == '__main__':
    main()
