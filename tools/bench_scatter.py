"""Micro-benchmark: Pallas BEV scatter variants on TPU (companion to
ops/scatter_tpu.py; KITTI eval shapes B=8, V=40448, C=64, 496x432 canvas)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--v', type=int, default=40448)
    ap.add_argument('--c', type=int, default=64)
    ap.add_argument('--slots', type=int, default=496 * 432)
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidardetection_tpu.ops import scatter_tpu as st

    rng = np.random.RandomState(0)
    b, v, c, n_slots = args.b, args.v, args.c, args.slots
    keys = np.sort(np.stack([
        rng.choice(n_slots, v, replace=False) for _ in range(b)]), axis=1)
    # mark a tail of rows invalid (padding) per sample
    nvalid = rng.randint(v // 2, v, size=b)
    for i in range(b):
        keys[i, nvalid[i]:] = n_slots
    feats = rng.randn(b, v, c).astype(np.float32)
    dt = jnp.dtype(args.dtype)
    feats_j = jnp.asarray(feats, dt)
    keys_j = jnp.asarray(keys, jnp.int32)

    ref = np.zeros((b, n_slots, c), np.float32)
    for i in range(b):
        ref[i, keys[i, :nvalid[i]]] = feats[i, :nvalid[i]].astype(
            dt).astype(np.float32)

    impls = {
        'invmap': st._scatter_invmap,
        'windowed': st._scatter_pallas,
    }
    for name, fn in impls.items():
        try:
            out = np.asarray(fn(feats_j, keys_j, n_slots), np.float32)
            err = np.abs(out - ref).max()

            @jax.jit
            def chain(f, k, n, fn=fn):
                def body(_, carry):
                    # keep the perturbation in f.dtype (a f32 carry would
                    # promote the whole feature table to f32)
                    o = fn(f + (carry * 1e-12).astype(f.dtype), k, n_slots)
                    return o.reshape(-1)[0].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            _ = float(chain(feats_j, keys_j, 2))
            t0 = time.perf_counter()
            _ = float(chain(feats_j, keys_j, args.iters))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            gb = (b * v * c * dt.itemsize + b * n_slots * c * dt.itemsize) / 1e9
            print(f'{name:<10} {ms:8.3f} ms/call  maxerr={err:.2e}  '
                  f'~{gb / (ms / 1e3):.0f} GB/s')
        except Exception as e:
            print(f'{name:<10} FAILED: {type(e).__name__}: {e}')


if __name__ == '__main__':
    main()
