"""Per-stage TPU timing for a detector's eval path.

Times cumulative prefixes of the module topology (vfe, map_to_bev,
backbone_2d, dense_head, ...) plus post-processing, each as an on-device
fori_loop chain (one dispatch, one scalar fetch), and prints the marginal
cost of each stage. Companion to bench.py for perf work.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='tools/cfgs/kitti_models/pointpillar.yaml')
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.models.detectors.post_processing import post_processing
    from lidardetection_tpu.parallel.train_step import (
        device_batch, jit_init,
    )
    from lidardetection_tpu.utils.common import set_random_seed

    set_random_seed(42)
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 32768
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=False, num_scenes=args.batch_size, model_cfg=cfg.MODEL)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    db = device_batch(batch)
    variables = jit_init(model, db)
    params, stats = variables['params'], variables['batch_stats']
    db = jax.device_put(db)
    _ = float(jnp.sum(db['voxels']))

    # discover module order from an unbound setup
    bound = model.bind(variables)
    order = bound.module_order
    del bound
    post_cfg = cfg.MODEL.POST_PROCESSING
    num_class = len(cfg.CLASS_NAMES)

    input_keys = set(db.keys())

    def leaf_scalar(tree):
        # only stage OUTPUTS feed the carry: summing the pass-through input
        # arrays (voxels alone is 168 MB) would charge an extra HBM pass
        # over the whole batch to every stage
        if isinstance(tree, dict):
            tree = {k: v for k, v in tree.items()
                    if k not in input_keys and not callable(v)}
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
        return tot

    def prefix_fn(k, with_post=False):
        def run(m, batch, training=False):
            if 'points' in batch and 'point_valid' not in batch:
                n = batch['points'].shape[1]
                batch = {**batch, 'point_valid':
                         jnp.arange(n)[None, :] < batch['num_points'][:, None]}
            for name in m.module_order[:k]:
                batch = getattr(m, name)(batch, training=training)
            return batch

        has_points = 'points' in db

        @jax.jit
        def chain(params, stats, db, n):
            # voxels AND points ride the carry with 1-element perturbations
            # (a full `voxels + carry` would charge a 168 MB copy to every
            # stage). Perturbing points keeps coordinate-dependent work
            # (FPS, keypoints, ball-query center searches) inside the
            # measured loop — feature-only perturbation lets XLA LICM hoist
            # it, silently excluding most of the VSA cost (see bench.py).
            def body(_, state):
                vox, pts, carry = state
                vox = vox.at[0, 0, 0, 3].add(carry)
                d = {**db, 'voxels': vox}
                if has_points:
                    pts = pts.at[0, 0, 0].add(carry)
                    d['points'] = pts
                out = model.apply({'params': params, 'batch_stats': stats},
                                  d, training=False, method=run)
                if with_post:
                    out = post_processing(out, post_cfg, num_class)
                return vox, pts, leaf_scalar(out)
            pts0 = (db['points'] if has_points
                    else jnp.zeros((1, 1, 1), jnp.float32))
            _, _, out = jax.lax.fori_loop(
                0, n, body, (db['voxels'], pts0, jnp.float32(0.0)))
            return out
        return chain

    stages = [(f'{i}:{order[i-1]}', prefix_fn(i)) for i in range(1, len(order) + 1)]
    stages.append(('post_processing', prefix_fn(len(order), with_post=True)))

    prev = 0.0
    print(f'{"stage":<24}{"cum ms/batch":>14}{"marginal ms":>14}')
    for name, chain in stages:
        # slope timing: difference two iteration counts so the ~30ms axon
        # relay round trip doesn't inflate each batch by ~30/iters ms
        _ = float(chain(params, stats, db, 2))
        n1, n2 = args.iters, args.iters * 4
        t0 = time.perf_counter()
        _ = float(chain(params, stats, db, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(chain(params, stats, db, n2))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (n2 - n1) * 1000
        print(f'{name:<24}{dt:>14.2f}{dt - prev:>14.2f}')
        prev = dt


if __name__ == '__main__':
    main()
