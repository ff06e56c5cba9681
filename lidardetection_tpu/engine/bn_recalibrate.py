"""Precise-BN recalibration: replace BN running statistics with population
statistics computed over the training data with FROZEN parameters.

Why this exists: BatchNorm running averages are an EMA with the reference's
torch momentum 0.01 (layers.py BN_MOMENTUM) — they need thousands of steps
to converge. Short schedules (the overfit train-to-AP harness trains ~240
steps; fine-tunes can be similarly short) leave the EMA lagging the true
statistics while the parameters are still drifting; the per-layer variance
gap COMPOUNDS multiplicatively through the conv stack (measured 12-30x
activation blowup at eval vs train mode after the 40-epoch synthetic
overfit — eval predictions were garbage while train-mode logits were
perfectly sane). The reference never hits this because its schedules run
~37k steps (8 GPUs x 80 epochs, README.md:88-98).

Method (a.k.a. precise BN, used by SWA/ResNet eval lore): with parameters
frozen, each BN's batch statistics are stationary, so the population
statistic is the average of per-batch statistics. Each module's EMA update
is ra' = m*ra + (1-m)*batch with a module-specific momentum m (0.99 for
detector BNs, 0.9 for PointNet++ SharedMLPs) — m is estimated per leaf by
running the SAME batch twice (b identical => m = (ra2-ra1)/(ra1-ra0)),
then each calibration batch's statistic is recovered by inverting one
update from a fixed starting state. No module code changes needed.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _forward_stats(model, params, batch_stats, db, rng):
    """One train-mode forward; returns the updated batch_stats EMA."""
    # 'proposal' drives the two-stage heads' RoI subsampling (PV-RCNN &
    # co.); single-stage models ignore the extra stream
    out = model.apply({'params': params, 'batch_stats': batch_stats}, db,
                      training=True, mutable=['batch_stats'],
                      rngs={'rng': rng, 'proposal': rng, 'dropout': rng})
    return out[1]['batch_stats']


def recalibrate_bn_stats(model, variables, loader, device_batch_fn,
                         n_batches=16, rng=None, logger=None):
    """Returns `variables` with batch_stats replaced by population stats.

    Args:
        model: flax detector; variables: {'params', 'batch_stats'}.
        loader: batch iterable (training data, augmentation optional).
        device_batch_fn: host->device batch converter
            (parallel.train_step.device_batch).
        n_batches: number of batches to average (16 x batch covers the
            calibration set; more reduces estimator variance).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = variables['params']
    bs0 = variables['batch_stats']

    it = iter(loader)
    first = device_batch_fn(next(it))

    # estimate each leaf's momentum: identical batch + identical rng =>
    # identical batch statistics b, so ra1 = m*ra0 + (1-m)b and
    # ra2 = m*ra1 + (1-m)b give m = (ra2-ra1)/(ra1-ra0) elementwise
    fwd = jax.jit(lambda p, s, d, r: _forward_stats(model, p, s, d, r))
    ra1 = fwd(params, bs0, first, rng)
    ra2 = fwd(params, ra1, first, rng)

    def leaf_momentum(a0, a1, a2):
        a0, a1, a2 = (np.asarray(x, np.float64) for x in (a0, a1, a2))
        num, den = a2 - a1, a1 - a0
        ok = np.abs(den) > 1e-12
        if not ok.any():  # stats unchanged: unused module; momentum moot
            return 1.0
        m = np.median(num[ok] / den[ok])
        return float(np.clip(m, 0.0, 0.999999))

    moms = jax.tree.map(leaf_momentum, bs0, ra1, ra2)

    # accumulate per-batch statistics: b = (ra1 - m*ra0) / (1 - m)
    sums = jax.tree.map(lambda x: np.zeros_like(np.asarray(x, np.float64)), bs0)
    count = 0

    def accumulate(batch, rng):
        nonlocal sums, count
        ra = fwd(params, bs0, batch, rng)
        sums = jax.tree.map(
            lambda s, a1, a0, m: s + (np.asarray(a1, np.float64)
                                      - m * np.asarray(a0, np.float64))
            / max(1.0 - m, 1e-6),
            sums, ra, bs0, moms)
        count += 1

    accumulate(first, rng)
    for i in range(n_batches - 1):
        try:
            nxt = next(it)
        except StopIteration:
            it = iter(loader)
            nxt = next(it)
        rng, sub = jax.random.split(rng)
        accumulate(device_batch_fn(nxt), sub)

    new_stats = jax.tree.map(
        lambda s, t: jnp.asarray(s / count, np.asarray(t).dtype), sums, bs0)
    if logger is not None:
        n_leaves = len(jax.tree.leaves(new_stats))
        logger.info('BN recalibration: %d batches, %d stat leaves '
                    '(precise-BN population statistics)', count, n_leaves)
    return {'params': params, 'batch_stats': new_stats}
