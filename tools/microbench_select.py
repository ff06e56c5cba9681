"""Isolated TPU timing of ball_select vs the candidate-window gather.

Splits grid_ball_query_multi's cost into (a) the (M, n_row) wide-row
candidate gather producing the ~600 MB window tensor and (b) the Pallas
selection kernel consuming it, at VSA shapes.
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
    ap.add_argument('--n_row', type=int, default=9)
    ap.add_argument('--cell_cap', type=int, default=64)
    ap.add_argument('--iters', type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.ops.select_tpu import ball_select

    B, M, N = args.batch_size, args.num_kp, args.n_src
    cap, n_row = args.cell_cap, args.n_row
    NW = 4
    nb = -(-N // cap) + 2
    R = B * M
    rng = np.random.default_rng(0)
    radii, nsamples = (0.4, 0.8), (16, 16)

    table = jnp.asarray(rng.standard_normal((nb, 4 * NW * cap)), jnp.float32)
    start = jnp.asarray(rng.integers(0, N - 3 * cap, (R, n_row)), jnp.int32)
    end = jnp.minimum(start + rng.integers(0, 3 * cap, (R, n_row)), N)
    end = jnp.asarray(end, jnp.int32)
    centers = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)

    def timed(label, fn, *arrs):
        @jax.jit
        def chain(n, *arrs):
            def body(_, carry):
                a0 = arrs[0].at[0, 0].add(carry * 1e-12)
                out = fn(a0, *arrs[1:])
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, 'dtype')]
                tot = jnp.float32(0.0)
                for l in leaves:
                    tot += jnp.sum(l.reshape(-1)[:1].astype(jnp.float32))
                return tot * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        _ = float(chain(2, *arrs))
        t0 = time.perf_counter()
        _ = float(chain(args.iters, *arrs))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(chain(args.iters * 3, *arrs))
        t2 = time.perf_counter() - t0
        print(f'{label:<44}{(t2 - t1) / (args.iters * 2) * 1000:>9.2f} ms',
              flush=True)

    blk = jnp.minimum(start // cap, nb - 1)

    timed(f'window gather (R={R}, n_row={n_row}, 4KB rows)',
          lambda t, b: t[b], table, blk)

    cand = table[blk]
    timed('ball_select kernel only',
          lambda c, s, e, ctr: ball_select(c, s, e, ctr, radii, nsamples,
                                           cap, nb, nw=NW),
          cand, start, end, centers)

    timed('gather + kernel',
          lambda t, b, s, e, ctr: ball_select(t[b], s, e, ctr, radii,
                                              nsamples, cap, nb, nw=NW),
          table, blk, start, end, centers)


if __name__ == '__main__':
    main()
