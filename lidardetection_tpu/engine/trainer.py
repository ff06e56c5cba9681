"""Training loop (re-expresses tools/train_utils/train_utils.py:9-147).

The reference's per-iteration Python body (zero_grad/backward/clip/step) is
one jitted `train_step`; the loop only feeds batches and logs. Checkpoints
save per epoch with rotation; resume picks the newest checkpoint.
"""

import time

import jax
import numpy as np

from ..parallel.dist import is_main_process, shard_batch_multihost
from ..parallel.mesh import shard_batch
from ..parallel.train_step import TrainState, device_batch, make_train_step
from ..utils.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from ..utils.optimization import build_optimizer


def train_model(model, variables, loader, optim_cfg, total_epochs, ckpt_dir,
                logger, mesh=None, start_epoch=0, max_ckpt_save_num=30,
                ckpt_save_interval=1, log_interval=20, tb_writer=None,
                lr_sched=None, state=None, profile_dir=None,
                profile_steps=(10, 15), multihost=False):
    iters_per_epoch = len(loader)
    if state is None:
        tx, lr_sched = build_optimizer(optim_cfg, iters_per_epoch, total_epochs)
        state = TrainState.create(params=variables['params'],
                                  batch_stats=variables['batch_stats'], tx=tx)
        latest = latest_checkpoint(ckpt_dir) if ckpt_dir else None
        if latest is not None:
            state, start_epoch = restore_checkpoint(latest, state, logger)
            logger.info('resumed from %s (epoch %d)', latest, start_epoch)

    step_fn = make_train_step(model, mesh=mesh)

    # jax.profiler trace of a few steady-state steps (the reference has no
    # profiler at all, SURVEY §5; traces are viewable in xprof/tensorboard)
    prof_start, prof_stop = profile_steps if profile_dir else (-1, -1)
    if profile_dir:
        # clamp the window into the run (tiny smoke runs still get a trace)
        total_steps = (total_epochs - start_epoch) * iters_per_epoch
        prof_stop = min(prof_stop, total_steps)
        prof_start = min(prof_start, max(prof_stop - 2, 0))
    profiling = False

    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t_epoch = time.time()
        losses = []
        for it, batch in enumerate(loader):
            global_it = (epoch - start_epoch) * iters_per_epoch + it
            if global_it == prof_start:
                jax.block_until_ready(state.params)
                jax.profiler.start_trace(profile_dir)
                profiling = True
                logger.info('profiler: tracing steps %d-%d to %s',
                            prof_start, prof_stop, profile_dir)
            db = device_batch(batch)
            if mesh is not None:
                db = shard_batch_multihost(db, mesh) if multihost \
                    else shard_batch(db, mesh)
            state, tb = step_fn(state, db)
            if profiling and global_it + 1 == prof_stop:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                prof_start = -1
            if it % log_interval == 0:
                loss = float(tb['loss'])
                losses.append(loss)
                cur_lr = float(lr_sched(int(state.step))) if lr_sched else float('nan')
                logger.info('epoch %d it %d/%d loss %.4f lr %.2e',
                            epoch, it, iters_per_epoch, loss, cur_lr)
                if tb_writer is not None:
                    # reference logs train/loss + meta_data/learning_rate
                    # (train_utils.py:54-58)
                    tb_writer.add_scalar('meta_data/learning_rate', cur_lr,
                                         int(state.step))
                    for k, v in tb.items():
                        tb_writer.add_scalar(f'train/{k}', float(v), int(state.step))
        if profiling:  # profile window ran past the data (tiny epochs)
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling, prof_start = False, -1
        # drain the async dispatch queue so the epoch time is honest (and
        # the subsequent checkpoint's device_get isn't billed the epoch's
        # leftover compute)
        jax.block_until_ready(state.params)
        logger.info('epoch %d done in %.1fs (mean logged loss %.4f)',
                    epoch, time.time() - t_epoch,
                    np.mean(losses) if losses else float('nan'))
        # save every ckpt_save_interval epochs + always the final epoch
        # (reference tools/train.py:35 --ckpt_save_interval)
        if ckpt_dir and is_main_process() and (
                (epoch + 1) % ckpt_save_interval == 0
                or epoch + 1 == total_epochs):
            save_checkpoint(state, ckpt_dir, epoch + 1,
                            max_ckpt_save_num=max_ckpt_save_num, logger=logger)
    return state
