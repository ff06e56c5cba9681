"""Optimizers and LR schedules (optax).

Re-expresses tools/train_utils/optimization/: adam / sgd / adam_onecycle
(fastai OptimWrapper + OneCycle, fastai_optim.py:101-233 and
learning_schedules_fastai.py:60-78). The fastai machinery collapses to an
optax chain: decoupled ("true") weight decay, cosine one-cycle lr, and the
one-cycle beta1 (momentum) anneal moms[0] -> moms[1] -> moms[0].
"""

import math

import optax


def _annealing_cos(start, end, pct):
    return end + (start - end) / 2 * (math.cos(math.pi * pct) + 1)


def onecycle_momentum_schedule(total_steps, moms, pct_start):
    """beta1 schedule of OneCycle (learning_schedules_fastai.py:71-74)."""
    import jax.numpy as jnp

    split = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / max(split, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - split) / max(total_steps - split, 1), 0.0, 1.0)
        phase1 = moms[1] + (moms[0] - moms[1]) / 2 * (jnp.cos(jnp.pi * pct1) + 1)
        phase2 = moms[0] + (moms[1] - moms[0]) / 2 * (jnp.cos(jnp.pi * pct2) + 1)
        return jnp.where(step < split, phase1, phase2)

    return sched


def decay_step_schedule(total_iters_each_epoch, optim_cfg):
    """LambdaLR epoch-decay schedule (optimization/__init__.py:41-48)."""
    import jax.numpy as jnp

    decay_steps = [x * total_iters_each_epoch for x in optim_cfg['DECAY_STEP_LIST']]
    lr = optim_cfg['LR']
    lr_decay = optim_cfg['LR_DECAY']
    lr_clip = optim_cfg['LR_CLIP']

    def sched(step):
        cur_decay = jnp.asarray(1.0)
        for ds in decay_steps:
            cur_decay = jnp.where(step >= ds, cur_decay * lr_decay, cur_decay)
        return lr * jnp.maximum(cur_decay, lr_clip / lr)

    return sched


def build_optimizer(optim_cfg, total_iters_each_epoch, total_epochs):
    """Returns (optax transform, lr_schedule_fn for logging)."""
    total_steps = total_iters_each_epoch * total_epochs
    name = optim_cfg['OPTIMIZER']
    wd = optim_cfg.get('WEIGHT_DECAY', 0.0)
    clip = optim_cfg.get('GRAD_NORM_CLIP', None)

    if name == 'adam_onecycle':
        lr_sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=optim_cfg['LR'],
            pct_start=optim_cfg['PCT_START'],
            div_factor=optim_cfg['DIV_FACTOR'],
            final_div_factor=1e4,  # low_lr / 1e4 (learning_schedules_fastai.py:70)
        )
        b1_sched = onecycle_momentum_schedule(
            total_steps, list(optim_cfg['MOMS']), optim_cfg['PCT_START'])
        inner = optax.inject_hyperparams(
            lambda lr, b1: optax.chain(
                optax.scale_by_adam(b1=b1, b2=0.99),  # betas (0.9->sched, 0.99)
                optax.add_decayed_weights(wd),        # true_wd, bn included
                optax.scale_by_learning_rate(lr),
            ))(lr=lr_sched, b1=b1_sched)
    elif name == 'adam':
        lr_sched = decay_step_schedule(total_iters_each_epoch, optim_cfg)
        inner = optax.inject_hyperparams(
            lambda lr: optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(lr),
            ))(lr=lr_sched)
    elif name == 'sgd':
        lr_sched = decay_step_schedule(total_iters_each_epoch, optim_cfg)
        inner = optax.inject_hyperparams(
            lambda lr: optax.chain(
                optax.trace(decay=optim_cfg['MOMENTUM']),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(lr),
            ))(lr=lr_sched)
    else:
        raise NotImplementedError(name)

    tx = optax.chain(optax.clip_by_global_norm(clip), inner) if clip else inner
    return tx, lr_sched
