"""Multi-process (multi-host) runtime.

Replaces the reference's torch.distributed layer: `init_dist_pytorch` /
`init_dist_slurm` (pcdet/utils/common_utils.py:146-186) become one
`jax.distributed.initialize` call; DistributedSampler becomes the loader's
shard slicing (datasets/__init__.py); the filesystem pickle all-gather used
to merge eval results (common_utils.py:206-227) is mirrored by
`merge_results_dist` with a device-backed barrier.

On a real TPU pod every `initialize` argument is auto-detected from the
environment; the explicit arguments exist for CPU-backed multi-process
testing (tests/test_multihost.py) and GPU-style launches.
"""

import pickle
from pathlib import Path

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Join the process group. Returns (process_index, process_count)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_main_process():
    return jax.process_index() == 0


def shard_batch_multihost(batch, mesh, axis_name='data'):
    """Build GLOBAL arrays from each process's LOCAL batch shard.

    Every process passes its local slice (the loader's shard); the returned
    arrays are globally-shaped and sharded over the mesh's data axis, with
    process p's samples occupying rows [p*local_b, (p+1)*local_b). The
    single-process equivalent is parallel.mesh.shard_batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in batch.items():
        if k == 'batch_size' or np.ndim(v) == 0:
            out[k] = v
        elif getattr(v, 'dtype', None) is not None and v.dtype.kind in 'fiub':
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(v))
        else:
            out[k] = v
    return out


def barrier(name='barrier'):
    """Cross-process sync (the reference's dist.barrier())."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def merge_results_dist(result_part, size, tmpdir):
    """All-gather a per-process list of python objects through a shared
    filesystem, mirroring common_utils.merge_results_dist
    (pcdet/utils/common_utils.py:206-227): barrier -> per-rank pickle ->
    rank-0 interleaved merge truncated to `size`.

    Returns the merged list on process 0, None elsewhere. `tmpdir` must be
    visible to all processes (NFS/GCS-fuse on pods).
    """
    tmpdir = Path(tmpdir)
    if is_main_process():
        tmpdir.mkdir(parents=True, exist_ok=True)
    barrier('merge_results_dist:mkdir')
    rank, world = jax.process_index(), jax.process_count()
    with open(tmpdir / f'result_part_{rank}.pkl', 'wb') as f:
        pickle.dump(result_part, f)
    barrier('merge_results_dist:write')
    if not is_main_process():
        return None
    part_list = []
    for r in range(world):
        with open(tmpdir / f'result_part_{r}.pkl', 'rb') as f:
            part_list.append(pickle.load(f))
    # loader shards are strided (idx[shard_id::num_shards]), so interleave
    ordered = []
    for res in zip(*part_list):
        ordered.extend(res)
    # remove the part files (common_utils.py:227 shutil.rmtree): a later run
    # with fewer processes must not read stale parts
    import shutil
    shutil.rmtree(tmpdir, ignore_errors=True)
    return ordered[:size]
