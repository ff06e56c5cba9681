"""Marginal TPU timing of the LIVE grid_ball_query_multi path.

Times (a) the multi-operand sort alone, (b) prep (sort + boundary tables +
row-run lookup + candidate windows), and (c) the full query incl. the
Pallas ball_select kernel, per VSA source shape — the stage split of
ops/pointnet2.py:grid_ball_query_multi as shipped (the older
microbench_gbq.py replicates the retired 27-cell top_k path).
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
    ap.add_argument('--cell_cap', type=int, default=64)
    ap.add_argument('--iters', type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.ops import pointnet2 as p2

    B, M = args.batch_size, args.num_kp
    bounds = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    rng = np.random.default_rng(0)

    def mkpts(n):
        x = rng.uniform(0, 69, (B, n)).astype(np.float32)
        y = rng.uniform(-39, 39, (B, n)).astype(np.float32)
        z = rng.uniform(-3, 1, (B, n)).astype(np.float32)
        return jnp.asarray(np.stack([x, y, z], axis=-1))

    def timed(label, fn, *arrs):
        @jax.jit
        def chain(n, *arrs):
            def body(_, carry):
                a0 = arrs[0].at[0, 0, 0].add(carry * 1e-12)
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
        print(f'{label:<42}{(t2 - t1) / (args.iters * 2) * 1000:>9.2f} ms',
              flush=True)

    kp = mkpts(M)
    kv = jnp.ones((B, M), bool)
    sources = [('raw_points', 32768, (0.4, 0.8), (16, 16)),
               ('x_conv3', 24576, (1.2, 2.4), (16, 32)),
               ('x_conv4', 16384, (2.4, 4.8), (16, 32))]
    for name, n, radii, ns in sources:
        src = mkpts(n)
        nn = jnp.full((B,), n - 128, jnp.int32)

        def sort_only(s, c):
            def one(sb):
                nn_ = sb.shape[0]
                iota = jnp.arange(nn_, dtype=jnp.int32)
                ck = (sb[:, 0] * 100).astype(jnp.int32)
                return jax.lax.sort((ck, sb[:, 0], sb[:, 1], sb[:, 2], iota),
                                    dimension=0, num_keys=1, is_stable=True)
            return jax.vmap(one)(s)

        timed(f'{name} V={n}: sort only', sort_only, src, kp)

        # prep via the internal helper (mirror grid_ball_query_multi setup)
        import functools
        full = functools.partial(
            p2.grid_ball_query_multi, radii, ns,
            bounds=bounds, cell_cap=args.cell_cap)

        def prep_only(s, c, radii=radii, ns=ns):
            # run the full function but return before the kernel by
            # reaching into the module: easiest faithful split is to time
            # full and kernel-only separately; here approximate prep by
            # calling with _FORCE_KERNEL_INTERPRET False on CPU? -> instead
            # time candidate windows explicitly at this source's geometry
            cell = float(max(radii))
            x0, y0, z0, x1, y1, z1 = bounds
            gx = max(int(np.ceil((x1 - x0) / cell)), 1)
            gy = max(int(np.ceil((y1 - y0) / cell)), 1)
            n_cells = gx * gy
            def one(sb, cb):
                nn_ = sb.shape[0]
                iota = jnp.arange(nn_, dtype=jnp.int32)
                ck = jnp.clip(((sb[:, 0] - x0) / cell).astype(jnp.int32)
                              * gy + ((sb[:, 1] - y0) / cell).astype(jnp.int32),
                              0, n_cells)
                sk, sx, sy, sz, order = jax.lax.sort(
                    (ck, sb[:, 0], sb[:, 1], sb[:, 2], iota),
                    dimension=0, num_keys=1, is_stable=True)
                src_sorted = jnp.stack([sx, sy, sz], axis=1)
                bt = p2._cell_boundaries(sk, n_cells)
                cc = jnp.clip(((cb[:, 0] - x0) / cell).astype(jnp.int32),
                              0, gx - 1) * gy + \
                    jnp.clip(((cb[:, 1] - y0) / cell).astype(jnp.int32),
                             0, gy - 1)
                start = bt[cc][:, None] + jnp.arange(6, dtype=jnp.int32)[None, :] * 0
                cand, pos = p2._candidate_windows(
                    src_sorted, order, jnp.tile(start, (1, 1)), args.cell_cap,
                    nw=4)
                return cand
            return jax.vmap(one)(s, c)

        timed(f'{name} V={n}: sort+bounds+1-row windows', prep_only, src, kp)
        timed(f'{name} V={n}: FULL grid_bq_multi',
              lambda s, c: full(s, nn, c, kv), src, kp)


if __name__ == '__main__':
    main()
