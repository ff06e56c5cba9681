"""Jitted train/eval steps.

Replaces the reference's model_fn_decorator + train_one_epoch inner body
(pcdet/models/__init__.py:25-41, tools/train_utils/train_utils.py:17-58):
one pure function per step, jit-compiled once with GSPMD shardings — batch
split over the `data` mesh axis, params replicated. Gradient psum and
cross-replica BN reductions are inserted by XLA from the sharding
annotations (the NCCL all-reduce equivalent).
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)


DEVICE_KEYS = ('voxels', 'voxel_coords', 'voxel_num_points', 'num_voxels',
               'points', 'num_points', 'gt_boxes', 'locations', 'rotations_y',
               'bev_tile_starts')


def device_batch(batch):
    """Select the array keys the jitted step consumes
    (the host->device contract, replacing load_data_to_gpu,
    pcdet/models/__init__.py:16-22). rb_* keys are the host-built sparse
    rulebooks (ops/sparse_plan.py)."""
    return {k: batch[k] for k in batch
            if k in DEVICE_KEYS or k.startswith('rb_')}


def jit_init(model, batch, seed=0):
    """model.init under jit: ONE compiled program instead of an eager
    op-by-op forward. Off-host backends dispatch each eager op over the
    wire (~30 ms/op on the axon relay) and compile every Pallas kernel
    variant eagerly — eager init of a two-stage detector costs tens of
    minutes there; jitted it is one compile."""
    import jax

    return jax.jit(functools.partial(model.init, training=False))(
        jax.random.PRNGKey(seed), batch)


def make_train_step(model, mesh=None, axis_name='data', donate=True):
    """Build the jitted train step for `model` (a Detector3D).

    step(state, batch) -> (state, tb_dict)
    """

    def step(state, batch):
        # per-step rng for stochastic layers (RoI sampling, dropout)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rngs = {'proposal': jax.random.fold_in(rng, 1),
                'dropout': jax.random.fold_in(rng, 2)}

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, training=True, mutable=['batch_stats'], rngs=rngs)
            loss, tb = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                out, method=model.loss)
            return loss, (tb, mutated['batch_stats'])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, new_batch_stats=new_stats)
        return new_state, tb

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, post_cfg, num_class, mesh=None, axis_name='data'):
    """Jitted forward + post-processing returning padded predictions."""
    from ..models.detectors.post_processing import compute_recall, post_processing

    def step(params, batch_stats, batch):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          batch, training=False)
        preds = post_processing(out, post_cfg, num_class)
        if 'gt_boxes' in batch:
            preds['recall'] = compute_recall(
                preds['pred_boxes'], preds['pred_mask'], batch['gt_boxes'],
                tuple(post_cfg['RECALL_THRESH_LIST']),
                rois=out.get('rois'), roi_mask=out.get('roi_valid'))
        return preds

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(step, in_shardings=(repl, repl, data))


def make_forward(model):
    """Plain jitted inference forward (demo.py path)."""

    @functools.partial(jax.jit)
    def fwd(params, batch_stats, batch):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           batch, training=False)

    return fwd
