"""Cumulative-prefix TPU timing of grid_ball_query_multi internals.

Replicates the stages of ops/pointnet2.py:grid_ball_query_multi at VSA
shapes and times each prefix (sort -> boundaries -> cell lookup -> candidate
gather -> d2 -> per-radius selection), so the marginal cost of every step is
visible. Companion to tools/microbench_bq.py (isolated-op numbers).
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
    ap.add_argument('--cell_cap', type=int, default=64)
    ap.add_argument('--iters', type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.ops import pointnet2 as p2

    B, M, N = args.batch_size, args.num_kp, args.n_src
    cap = args.cell_cap
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

    x0, y0, z0, x1, y1, z1 = bounds
    cell = float(max(radii))
    gx = max(int(np.ceil((x1 - x0) / cell)), 1)
    gy = max(int(np.ceil((y1 - y0) / cell)), 1)
    gz = max(int(np.ceil((z1 - z0) / cell)), 1)
    n_cells = gx * gy * gz
    origin = jnp.asarray([x0, y0, z0], jnp.float32)
    dims = jnp.asarray([gx, gy, gz], jnp.int32)

    def cell_of(p):
        c = jnp.floor((p - origin) / cell).astype(jnp.int32)
        return jnp.clip(c, 0, dims - 1)

    def cell_key(c):
        return (c[..., 2] * gy + c[..., 1]) * gx + c[..., 0]

    off = jnp.asarray(
        [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)

    def one(s, n, c, stop):
        nn_ = s.shape[0]
        valid = jnp.arange(nn_) < n
        ck = jnp.where(valid, cell_key(cell_of(s)), n_cells)
        iota = jnp.arange(nn_, dtype=jnp.int32)
        sk, sx, sy, sz, order = jax.lax.sort(
            (ck, s[:, 0], s[:, 1], s[:, 2], iota),
            dimension=0, num_keys=1, is_stable=True)
        src_sorted = jnp.stack([sx, sy, sz], axis=1)
        if stop == 'sort':
            return (sk, src_sorted, order)
        bounds_tab = p2._cell_boundaries(sk, n_cells)
        se_tab = jnp.stack([bounds_tab[:-1], bounds_tab[1:]], axis=1)
        if stop == 'boundaries':
            return (se_tab, src_sorted, order)
        cc = cell_of(c)
        nb = cc[:, None, :] + off[None, :, :]
        ok_cell = jnp.all((nb >= 0) & (nb < dims), axis=-1)
        nk = jnp.where(ok_cell, cell_key(nb), n_cells + 1)
        se = se_tab[nk]
        start = se[..., 0]
        end = jnp.minimum(se[..., 1], start + cap)
        if stop == 'lookup':
            return (start, end, src_sorted, order)
        cx, cy, cz, orig, pos = p2._overlapped_candidates(
            src_sorted, order, start, cap)
        if stop == 'gather':
            return (cx, orig, pos, end)
        live = ((pos >= start[..., None]) & (pos < end[..., None]))
        d2 = ((cx - c[:, None, None, 0]) ** 2
              + (cy - c[:, None, None, 1]) ** 2
              + (cz - c[:, None, None, 2]) ** 2)
        if stop == 'd2':
            return (d2, live, orig)
        w = 2 * cap
        neg_orig = -orig.astype(jnp.float32)
        m_ = c.shape[0]
        if stop in ('sel1b', 'fullb'):
            d2, live, neg_orig = jax.lax.optimization_barrier(
                (d2, live, neg_orig))
        results = []
        for radius, nsample in zip(radii, nsamples):
            if stop in ('sel1', 'sel1b') and results:
                break
            hit = live & (d2 < float(radius) ** 2)
            score = jnp.where(hit, neg_orig, -jnp.inf)
            k1 = min(nsample, w)
            s1, _ = jax.lax.top_k(score, k1)
            s1 = s1.reshape(m_, 27 * k1)
            k = min(nsample, 27 * k1)
            top, _ = jax.lax.top_k(s1, k)
            got = jnp.isfinite(top)
            out = jnp.where(got, (-top).astype(jnp.int32), 0)
            empty = got.sum(axis=1) <= 0
            fill = jnp.where(empty, 0, out[:, 0])
            results.append((jnp.where(got, out, fill[:, None]), empty))
        return tuple(results)

    def timed(label, stop):
        fn = jax.jit(lambda s, n, c: jax.vmap(
            lambda a, b_, d: one(a, b_, d, stop))(s, n, c),
            static_argnames=())

        @jax.jit
        def chain(k, s, n, c):
            def body(_, carry):
                s0 = s.at[0, 0, 0].add(carry * 1e-12)
                out = jax.vmap(lambda a, b_, d: one(a, b_, d, stop))(
                    s0, n, c)
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, 'dtype')]
                tot = jnp.float32(0.0)
                for l in leaves:
                    tot += jnp.sum(l.reshape(-1)[:1].astype(jnp.float32))
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
        print(f'{label:<22}{ms:>9.2f} ms', flush=True)
        return ms

    for stop in ('sel1b', 'fullb'):
        timed(stop, stop)


if __name__ == '__main__':
    main()
