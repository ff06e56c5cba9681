"""Benchmark: PointPillar inference throughput (scans/sec/chip).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.json): 2000 scans/sec/chip on v5e.

Measures the steady-state jitted device pipeline (forward + NMS post-
processing) on KITTI-shaped synthetic scans at eval capacity (40k pillars,
matching MAX_NUMBER_OF_VOXELS test, pointpillar.yaml). The reference's
analogous metric is eval `sec_per_example` (tools/eval_utils/eval_utils.py:79).
"""

import json
import time

import numpy as np


def main():
    import jax

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.train_step import device_batch, make_eval_step
    from lidardetection_tpu.utils.common import set_random_seed

    set_random_seed(42)
    batch_size = 8
    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 32768
    del cfg.DATA_CONFIG.DATA_AUGMENTOR

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=False, num_scenes=batch_size)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    db = device_batch(batch)
    variables = model.init(jax.random.PRNGKey(0), db, training=False)
    import jax.numpy as jnp

    from lidardetection_tpu.models.detectors.post_processing import post_processing

    params, stats = variables['params'], variables['batch_stats']
    db = jax.device_put(db)
    # force upload completion with a real fetch (the axon relay's
    # block_until_ready does not reliably block)
    _ = float(jnp.sum(db['voxels']))

    post_cfg = cfg.MODEL.POST_PROCESSING
    num_class = len(cfg.CLASS_NAMES)

    @jax.jit
    def chain(params, stats, db, n):
        # run the whole timed loop on device: each iteration depends on the
        # previous via the carry (so XLA cannot elide or overlap work), and
        # the host pays ONE dispatch + ONE scalar fetch. Per-iteration host
        # dispatch through the axon tunnel costs ~30 ms and would measure
        # the relay, not the chip. Voxels ride the loop carry and are
        # perturbed with a single-element update — a full `voxels + carry`
        # materialized a fresh 168 MB array every iteration (~0.5 ms of
        # HBM traffic measured on v5e, charged to the model unfairly).
        def body(_, state):
            vox, carry = state
            vox = vox.at[0, 0, 0, 3].add(carry * 1e-12)
            out = model.apply({'params': params, 'batch_stats': stats},
                              {**db, 'voxels': vox}, training=False)
            preds = post_processing(out, post_cfg, num_class)
            return vox, preds['pred_scores'].reshape(-1)[0]

        _, out = jax.lax.fori_loop(
            0, n, body, (db['voxels'], jnp.float32(0.0)))
        return out

    _ = float(chain(params, stats, db, 2))  # warmup / compile
    # slope timing: the axon relay costs ~30 ms per dispatch+fetch round
    # trip, so time two iteration counts and difference them — a single
    # 50-iter run would over-charge each batch ~0.6 ms
    n1, n2 = 20, 80
    t0 = time.perf_counter()
    _ = float(chain(params, stats, db, n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chain(params, stats, db, n2))
    t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (n2 - n1)

    scans_per_sec = batch_size / dt
    print(json.dumps({
        'metric': 'pointpillar_scans_per_sec_per_chip',
        'value': round(scans_per_sec, 2),
        'unit': 'scans/s',
        'vs_baseline': round(scans_per_sec / 2000.0, 4),
    }))


if __name__ == '__main__':
    main()
