"""Pallas scatter kernel contract, run in interpret mode on CPU.

Pins the pieces that only execute on TPU in production: the
PrefetchScalarGridSpec one-hot-matmul kernel itself, the host-precomputed
tile histogram (`host_tile_starts`), and — critically — the eval-time
occupancy-bucketing interplay: `bev_tile_starts` is computed at collate on
the FULL-capacity sorted table, while the DataLoader may truncate the
table to the batch-max occupancy afterwards (datasets/__init__.py
`_bucket`). Truncation only removes tail sentinel rows, so the histogram
stays valid; this test is the executable form of that argument.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp

from lidardetection_tpu.ops.scatter_tpu import (
    _scatter_pallas, host_tile_starts, n_tiles_padded,
)


def _mk_table(rng, capacity, n_valid, n_slots, c=8):
    keys = np.sort(rng.choice(n_slots, size=n_valid, replace=False))
    keys = np.concatenate([keys, np.full(capacity - n_valid, n_slots)])
    feats = rng.randn(capacity, c).astype(np.float32)
    feats[n_valid:] = rng.randn(capacity - n_valid, c)  # junk padding rows
    return keys.astype(np.int32), feats


def _dense_truth(keys, feats, n_valid, n_slots):
    out = np.zeros((n_slots, feats.shape[-1]), np.float32)
    out[keys[:n_valid]] = feats[:n_valid]
    return out


@pytest.mark.parametrize('n_slots', [4500, 2048])
def test_interpret_kernel_matches_dense(n_slots):
    rng = np.random.RandomState(0)
    capacity, n_valid = 1024, 700
    keys, feats = _mk_table(rng, capacity, n_valid, n_slots)
    starts = host_tile_starts(keys, n_slots)
    out = _scatter_pallas(jnp.asarray(feats)[None], jnp.asarray(keys)[None],
                          n_slots, jnp.asarray(starts)[None],
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               _dense_truth(keys, feats, n_valid, n_slots),
                               rtol=1e-6)


def test_truncated_table_with_full_capacity_starts():
    """Occupancy bucketing: starts computed at capacity, table truncated."""
    rng = np.random.RandomState(1)
    n_slots = 4500
    capacity, n_valid = 2048, 300
    keys, feats = _mk_table(rng, capacity, n_valid, n_slots)
    starts = host_tile_starts(keys, n_slots)  # FULL capacity histogram

    m = 512  # batch-max occupancy, rounded — drops only sentinel rows
    out = _scatter_pallas(jnp.asarray(feats[:m])[None],
                          jnp.asarray(keys[:m])[None],
                          n_slots, jnp.asarray(starts)[None],
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               _dense_truth(keys, feats, n_valid, n_slots),
                               rtol=1e-6)


def test_host_tile_starts_matches_brute_force():
    rng = np.random.RandomState(2)
    n_slots = 3000
    keys, _ = _mk_table(rng, 512, 400, n_slots)
    starts = host_tile_starts(keys, n_slots)
    nt = n_tiles_padded(n_slots)
    assert starts.shape == (nt + 1,)
    for i in range(0, nt + 1, 7):
        assert starts[i] == int((keys < i * 128).sum())
