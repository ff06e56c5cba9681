"""Device mesh + batch sharding.

The TPU-native replacement for the reference's DDP/NCCL layer
(pcdet/utils/common_utils.py:146-227, tools/train.py:142): a 1-D `data` mesh
over ICI; batches shard along their leading axis; parameters replicate.
Under jit/GSPMD the gradient all-reduce and the cross-replica BatchNorm
reductions are inserted automatically. The mesh keeps a single axis today but
everything takes the axis name as a parameter so model axes (huge BEV grids)
can be added without touching call sites.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name='data'):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='data'):
    """Device-put a host batch dict, sharding arrays along their leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in batch.items():
        if k == 'batch_size' or np.ndim(v) == 0:
            out[k] = v
            continue
        if getattr(v, 'dtype', None) is not None and v.dtype.kind in 'fiub':
            out[k] = jax.device_put(np.asarray(v), sharding)
        else:
            out[k] = v
    return out
