"""Cell-cap sweep for the TPU grid ball query (grid_ball_query_multi).

Times the real TPU path (Pallas ball_select) at VSA raw_points shapes for
several cell caps in one process, perturbing only the CENTERS each
iteration (source-side prep is per-batch precomputable and hoists out of
the model's measured loop too — bench.py note). Guides the
MODEL.BALL_QUERY_GRID_CELL_CAP setting.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--num_kp', type=int, default=2048)
    ap.add_argument('--n_src', type=int, default=32768)
    ap.add_argument('--caps', default='64,32,16')
    ap.add_argument('--iters', type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.ops import pointnet2 as p2

    B, M, N = args.batch_size, args.num_kp, args.n_src
    bounds = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    radii, nsamples = (0.4, 0.8), (16, 16)
    rng = np.random.default_rng(0)

    def mkpts(n):
        x = rng.uniform(0, 69, (B, n)).astype(np.float32)
        y = rng.uniform(-39, 39, (B, n)).astype(np.float32)
        z = rng.uniform(-3, 1, (B, n)).astype(np.float32)
        return jnp.asarray(np.stack([x, y, z], axis=-1))

    src = mkpts(N)
    nn_valid = jnp.full((B,), N - 128, jnp.int32)
    centers = mkpts(M)

    for cap in (int(c) for c in args.caps.split(',')):

        @jax.jit
        def chain(k, s, n, c, cap=cap):
            def body(_, carry):
                c0 = c.at[0, 0, 0].add(carry * 1e-12)
                outs = p2.grid_ball_query_multi(
                    radii, nsamples, s, n, c0, bounds=bounds, cell_cap=cap)
                tot = jnp.float32(0.0)
                for idx, empty in outs:
                    tot += idx.reshape(-1)[0].astype(jnp.float32)
                    tot += empty.reshape(-1)[0].astype(jnp.float32)
                return tot * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        _ = float(chain(2, src, nn_valid, centers))
        t0 = time.perf_counter()
        _ = float(chain(args.iters, src, nn_valid, centers))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(chain(args.iters * 3, src, nn_valid, centers))
        t2 = time.perf_counter() - t0
        ms = (t2 - t1) / (args.iters * 2) * 1000
        print(f'cap={cap:<4}{ms:>9.2f} ms/batch', flush=True)


if __name__ == '__main__':
    main()
