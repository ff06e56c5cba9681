"""Worker for tests/test_multihost.py: one process of a 2-process CPU
'pod'. Joins the jax.distributed group, runs two global-batch train steps
of a shrunken PointPillar on synthetic data, and prints both losses.

Must be launched with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

jax.config.update('jax_platforms', 'cpu')
# share the test suite's persistent compilation cache (the worker is a
# fresh process; without this each run recompiles the full train step)
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def main():
    coordinator, nprocs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from lidardetection_tpu.parallel.dist import (
        init_distributed, shard_batch_multihost,
    )
    init_distributed(coordinator, nprocs, rank)
    assert jax.process_count() == nprocs

    import numpy as np

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.parallel.mesh import make_mesh
    from lidardetection_tpu.parallel.train_step import (
        TrainState, device_batch, make_train_step,
    )
    from lidardetection_tpu.utils.optimization import build_optimizer

    cfg = cfg_from_yaml_file('tools/cfgs/kitti_models/pointpillar.yaml')
    cfg.MODEL.COMPUTE_DTYPE = 'float32'
    cfg.DATA_CONFIG.MAX_POINTS = 4000
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {
        'train': 800, 'test': 800}
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].VOXEL_SIZE = [0.32, 0.32, 4]
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    del cfg.DATA_CONFIG.DATA_AUGMENTOR

    global_batch = 8
    local_batch = global_batch // nprocs
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=local_batch,
        training=True, num_scenes=global_batch,
        num_shards=nprocs, shard_id=rank)
    batch = device_batch(next(iter(loader)))

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    opt, _ = build_optimizer(cfg.OPTIMIZATION, 5, 2)
    state = TrainState.create(variables['params'], variables['batch_stats'],
                              opt)

    mesh = make_mesh()  # global: nprocs * local devices
    assert mesh.devices.size == len(jax.devices())
    step = make_train_step(model, mesh=mesh, donate=False)
    db = shard_batch_multihost(batch, mesh)
    losses = []
    for _ in range(2):
        state, tb = step(state, db)
        losses.append(float(np.asarray(jax.device_get(tb['loss']))))
    print(f'MULTIHOST_LOSSES rank={rank} {losses[0]:.6f} {losses[1]:.6f}',
          flush=True)


if __name__ == '__main__':
    main()
