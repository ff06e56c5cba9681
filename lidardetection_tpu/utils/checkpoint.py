"""Checkpoint save/restore (orbax).

Replaces the reference's torch checkpointing
(tools/train_utils/train_utils.py:120-147): state dict {epoch, it,
model_state, optimizer_state, version} becomes an orbax-saved pytree
{step, params, batch_stats, opt_state}; rotation keeps max_ckpt_save_num
files; restore is shape-tolerant like load_params_from_file
(detector3d_template.py:321-347) — matching leaves are loaded, mismatched
ones keep their initialized values (enables transfer across head changes).
"""

import glob
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import __version__


def save_checkpoint(state, ckpt_dir, epoch, max_ckpt_save_num=30, logger=None):
    """Save train state under <ckpt_dir>/checkpoint_epoch_<epoch>."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    # rotation (train_utils.py:100-105); leftover orbax tmp dirs from a
    # killed save must not count toward the rotation budget
    ckpts = sorted(
        (f for f in glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*'))
         if _is_complete(f)),
        key=lambda f: int(re.findall(r'checkpoint_epoch_(\d+)', f)[0]))
    while len(ckpts) >= max_ckpt_save_num:
        victim = ckpts.pop(0)
        import shutil
        shutil.rmtree(victim, ignore_errors=True)

    path = os.path.join(ckpt_dir, f'checkpoint_epoch_{epoch}')
    payload = {
        'step': np.asarray(state.step),
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats),
        'opt_state': jax.device_get(state.opt_state),
        'meta': {'epoch': epoch, 'version': f'lidardetection_tpu+{__version__}'},
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if logger:
        logger.info('checkpoint saved: %s', path)
    return path


def _is_complete(path):
    # a trainer killed mid-save leaves an orbax `*.orbax-checkpoint-tmp*`
    # dir; resuming from it raises "incomplete checkpoint". Match the
    # exact final naming rather than a 'tmp' substring so a future
    # epoch-tag suffix can't be misclassified.
    return re.fullmatch(r'checkpoint_epoch_\d+', os.path.basename(path))


def latest_checkpoint(ckpt_dir):
    ckpts = glob.glob(os.path.join(os.path.abspath(ckpt_dir), 'checkpoint_epoch_*'))
    # skip incomplete saves so resume falls back to the newest COMPLETE epoch
    ckpts = [c for c in ckpts if _is_complete(c)]
    if not ckpts:
        return None
    return max(ckpts, key=lambda f: int(re.findall(r'checkpoint_epoch_(\d+)', f)[0]))


def _merge_matching(template, loaded, path='', logger=None):
    """Shape-tolerant recursive merge (detector3d_template.py:330-341)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_matching(v, loaded[k], f'{path}/{k}', logger)
            else:
                if logger:
                    logger.info('checkpoint miss (kept init): %s/%s', path, k)
                out[k] = v
        return out
    t_shape = getattr(template, 'shape', None)
    l_shape = getattr(loaded, 'shape', None)
    if t_shape == l_shape:
        return loaded
    if logger:
        logger.info('shape mismatch at %s: ckpt %s vs model %s (kept init)',
                    path, l_shape, t_shape)
    return template


def restore_checkpoint(path, state, logger=None, strict=False):
    """Restore into a TrainState template; partial match unless strict.

    The optimizer state is an optax namedtuple pytree, but a template-free
    orbax restore returns plain nested dicts — `jax.tree.map` across the
    two treedefs always raises, which silently cold-restarted Adam moments
    (and re-peaked OneCycle) on EVERY resume until round 4. Restoring
    against the live TrainState structure keeps the moments; the
    template-free path remains the fallback for cross-model transfer
    (shape-tolerant partial merge, detector3d_template.py:321-347).
    """
    template = {
        'step': np.asarray(jax.device_get(state.step)),
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats),
        'opt_state': jax.device_get(state.opt_state),
        'meta': {'epoch': 0, 'version': ''},
    }
    loaded = None
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            loaded = ckptr.restore(os.path.abspath(path), item=template)
            opt_restored = True
        except Exception:
            loaded = ckptr.restore(os.path.abspath(path))
            opt_restored = False
    epoch = int(loaded.get('meta', {}).get('epoch', 0) or 0)
    if strict:
        new_params = loaded['params']
        new_stats = loaded['batch_stats']
        new_opt = loaded['opt_state']
    else:
        new_params = _merge_matching(jax.device_get(state.params),
                                     loaded.get('params', {}), 'params', logger)
        new_stats = _merge_matching(jax.device_get(state.batch_stats),
                                    loaded.get('batch_stats', {}), 'batch_stats', logger)
        if opt_restored:
            new_opt = loaded['opt_state']
        else:
            new_opt = jax.device_get(state.opt_state)
            if logger:
                logger.info('optimizer state not restored '
                            '(checkpoint/model structure mismatch)')
    state = state.replace(
        params=new_params, batch_stats=new_stats, opt_state=new_opt,
        step=jax.numpy.asarray(loaded.get('step', 0)))
    return state, epoch
