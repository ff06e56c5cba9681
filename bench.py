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
    step = make_eval_step(model, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))

    import jax.numpy as jnp

    params, stats = variables['params'], variables['batch_stats']
    db = jax.device_put(db)
    # force upload completion with a real fetch (the axon relay's
    # block_until_ready does not reliably block)
    _ = float(jnp.sum(db['voxels']))

    def run_chain(n):
        # chain iterations through an on-device data dependency and end with
        # a single scalar fetch: per-iteration host syncs would measure the
        # tunnel round-trip, and free-running dispatch measures nothing
        carry = jnp.float32(0.0)
        out = None
        for _ in range(n):
            dbi = {**db, 'voxels': db['voxels'] + carry * 1e-12}
            out = step(params, stats, dbi)
            carry = out['pred_scores'].reshape(-1)[0]
        return float(carry)

    run_chain(2)  # warmup / compile
    iters = 30
    t0 = time.perf_counter()
    run_chain(iters)
    dt = time.perf_counter() - t0

    scans_per_sec = iters * batch_size / dt
    print(json.dumps({
        'metric': 'pointpillar_scans_per_sec_per_chip',
        'value': round(scans_per_sec, 2),
        'unit': 'scans/s',
        'vs_baseline': round(scans_per_sec / 2000.0, 4),
    }))


if __name__ == '__main__':
    main()
