"""Decompose the TPU grid ball query's cost at VSA shapes.

Times each internal piece in isolation — source argsort (grid build),
searchsorted (run lookup), contiguous block gather, distance compute, and
the per-radius top_k selection — so optimization targets the measured
dominator instead of a guess. Shapes mirror grid_ball_query_multi at
PV-RCNN eval settings (B=8, M=2048 centers, 27-cell neighborhoods).
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
    ap.add_argument('--num_centers', type=int, default=2048)
    ap.add_argument('--num_sources', type=int, default=32768)
    ap.add_argument('--cell_cap', type=int, default=64)
    ap.add_argument('--nsample', type=int, default=32)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    
    B, M, N, cap = (args.batch_size, args.num_centers, args.num_sources,
                    args.cell_cap)
    C = 27 * cap
    rng = np.random.default_rng(0)

    def timed(label, fn, *arrs):
        @jax.jit
        def chain(n, *arrs):
            def body(_, carry):
                # full perturbation: no LICM escape
                a0 = arrs[0] + carry.astype(arrs[0].dtype)
                out = fn(a0, *arrs[1:])
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, 'dtype')]
                tot = jnp.float32(0.0)
                for l in leaves:
                    tot += l.reshape(-1)[0].astype(jnp.float32)
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

    # 1. source grid build: argsort of N cell keys (int32)
    ck = jnp.asarray(rng.integers(0, 22000, (B, N)), jnp.int32)
    timed(f'argsort keys (B,{N})',
          lambda k: jax.vmap(jnp.argsort)(k), ck)

    # 2. searchsorted (method='sort') of M*27 queries into N sorted keys
    sk = jnp.sort(ck, axis=1)
    nk = jnp.asarray(rng.integers(0, 22000, (B, M * 27)), jnp.int32)
    timed(f'searchsorted x2 (B,{M * 27}) in (B,{N})',
          lambda q, s: (jax.vmap(lambda a, b: jnp.searchsorted(
              a, b, method='sort'))(s, q),
              jax.vmap(lambda a, b: jnp.searchsorted(
                  a, b, side='left', method='sort'))(s, q + 1)), nk, sk)

    # 3. block gather: B*(M*27) cap-wide dynamic slices from (N,) x4 planes
    plane = jnp.asarray(rng.standard_normal((B, N + cap)), jnp.float32)
    starts = jnp.asarray(rng.integers(0, N, (B, M, 27)), jnp.int32)
    del starts  # vmapped dynamic_slice path removed (915 ms, see log)

    # 3b. scalar row gather x4 (the pre-block-gather formulation)
    rows = jnp.asarray(rng.integers(0, N, (B, M, C)), jnp.int32)
    timed(f'scalar row gather x4 (B,{M},{C})',
          lambda p, r: [jax.vmap(lambda a, i: a[i])(p, r)
                        for _ in range(4)], plane, rows)

    # 4. d2 accumulate over candidates (3 planes)
    cand = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    ctr = jnp.asarray(rng.standard_normal((B, M, 1)), jnp.float32)
    timed(f'd2 accumulate x3 (B,{M},{C})',
          lambda c, x: ((c - x) ** 2 + (c - x) ** 2 + (c - x) ** 2), cand, ctr)

    # 5. top_k selection per radius (exact) over (M, C)
    score = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    timed(f'top_k k={args.nsample} (B,{M},{C})',
          lambda s: jax.vmap(lambda x: jax.lax.top_k(x, args.nsample))(s),
          score)
    timed(f'approx top_k k={args.nsample} (B,{M},{C})',
          lambda s: jax.vmap(lambda x: jax.lax.approx_max_k(
              x, args.nsample, recall_target=0.95))(s), score)

    # --- pieces of the overlapped-row formulation ---
    nb = N // cap + 2
    table = jnp.asarray(rng.standard_normal((B, nb, 2 * cap * 4)),
                        jnp.float32)
    blk = jnp.asarray(rng.integers(0, nb, (B, M, 27)), jnp.int32)
    timed(f'row gather (B,{M},27) of {2 * cap * 4}ch',
          lambda t, b: jax.vmap(lambda x, i: x[i])(t, b), table, blk)

    cand4 = jnp.asarray(rng.standard_normal((B, M, 27, 2 * cap, 4)),
                        jnp.float32)
    ctr3 = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
    timed(f'd2 reduce (B,{M},27,{2 * cap},4)',
          lambda c, x: jnp.sum(
              (c[..., :3] - x[:, :, None, None, :]) ** 2, axis=-1),
          cand4, ctr3)

    C2 = 27 * 2 * cap
    score2 = jnp.asarray(rng.standard_normal((B, M, C2)), jnp.float32)
    timed(f'top_k k={args.nsample} (B,{M},{C2})',
          lambda s: jax.vmap(lambda x: jax.lax.top_k(x, args.nsample))(s),
          score2)
    timed(f'top_k k={args.nsample} x2 (B,{M},{C2})',
          lambda s: [jax.vmap(lambda x: jax.lax.top_k(x, args.nsample))(s),
                     jax.vmap(lambda x: jax.lax.top_k(x + 1.0,
                                                      args.nsample))(s)],
          score2)

    # 6. sort-pairs alternative to top_k (full row sort, take prefix)
    vals = jnp.asarray(rng.integers(0, N, (B, M, C)), jnp.int32)
    timed(f'sort-pairs prefix{args.nsample} (B,{M},{C})',
          lambda s, v: jax.lax.sort((s, v), dimension=2,
                                    num_keys=1)[1][..., :args.nsample],
          score, vals)


def _run_main():
    main()


def extra():
    """Stage-wise selection decomposition (run: microbench_bq.py extra)."""
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import numpy as np
    rng = np.random.default_rng(0)
    B, M, cap, ns = 8, 2048, 64, 32
    w = 2 * cap

    import time

    def timed(label, fn, *arrs):
        @jax.jit
        def chain(n, *arrs):
            def body(_, carry):
                a0 = arrs[0] + carry.astype(arrs[0].dtype)
                out = fn(a0, *arrs[1:])
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, 'dtype')]
                tot = jnp.float32(0.0)
                for l in leaves:
                    tot += l.reshape(-1)[0].astype(jnp.float32)
                return tot * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        _ = float(chain(2, *arrs))
        t0 = time.perf_counter(); _ = float(chain(10, *arrs))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(chain(30, *arrs))
        t2 = time.perf_counter() - t0
        print(f'{label:<42}{(t2 - t1) / 20 * 1000:>9.2f} ms', flush=True)

    d2 = jnp.asarray(rng.uniform(0, 4, (B, M, 27, w)), jnp.float32)
    live = jnp.asarray(rng.uniform(size=(B, M, 27, w)) < 0.05)
    neg = jnp.asarray(-rng.integers(0, 32768, (B, M, 27, w)), jnp.float32)

    def sel(d2, live, neg, r):
        hit = live & (d2 < r * r)
        score = jnp.where(hit, neg, -jnp.inf)
        s1, _ = jax.lax.top_k(score, ns)
        s1 = s1.reshape(B, M, 27 * ns)
        top, _ = jax.lax.top_k(s1, ns)
        got = jnp.isfinite(top)
        out = jnp.where(got, (-top).astype(jnp.int32), 0)
        empty = got.sum(axis=-1) <= 0
        fill = jnp.where(empty, 0, out[..., 0])
        return jnp.where(got, out, fill[..., None]), empty

    timed('selection composite x1', lambda d, l, n: sel(d, l, n, 0.8),
          d2, live, neg)
    timed('selection composite x2',
          lambda d, l, n: (sel(d, l, n, 0.4), sel(d, l, n, 0.8)),
          d2, live, neg)
    timed('stage1 top_k only (B,M,27,128) k=32',
          lambda s: jax.lax.top_k(s, ns)[0], neg)
    timed('stage2 top_k only (B,M,864) k=32',
          lambda s: jax.lax.top_k(s.reshape(B, M, 27 * ns), ns)[0],
          neg[..., :ns])
    timed('hit+score only',
          lambda d, l, n: jnp.where(l & (d < 0.64), n, -jnp.inf),
          d2, live, neg)


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'extra':
    sys.argv = sys.argv[:1]
    extra()
    sys.exit(0)


if __name__ == '__main__':
    if not (len(sys.argv) > 1 and sys.argv[1] == 'extra'):
        _run_main()
