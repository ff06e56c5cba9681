"""Sweep rulebook-conv kernel variants/params at a given table shape.

Synthesizes a realistic monotone rulebook (banded in-plane offsets, z-shifted
bands for the outer groups, ~55% hit rate) and slope-times each config on the
current backend. Steers kernel work on the sparse path alongside
tools/profile_sparse.py.

    python tools/microbench_rbconv.py --vin 3072 --cin 64 --cout 64 --b 8
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_rulebook(rng, b, vi, vo, k=27, hit=0.55):
    """Monotone columns; in-plane offsets band near the diagonal, z groups
    shifted by ~vi/3 — the sorted-table geometry real rulebooks have."""
    rule = np.full((b, vo, k), vi, np.int32)
    for bi in range(b):
        for kk in range(k):
            shift = (kk // 9 - 1) * (vi // 3)
            jitter = (kk % 9 - 4) * 3
            rows = np.arange(vo)
            cand = rows * vi // vo + shift + jitter
            hits = (rng.rand(vo) < hit) & (cand >= 0) & (cand < vi)
            # enforce strictly ascending among hits
            c = cand[hits]
            c = np.maximum.accumulate(c)
            _, first = np.unique(c, return_index=True)
            keep = np.zeros(len(c), bool)
            keep[first] = True
            idx = np.where(hits)[0][keep]
            rule[bi, idx, kk] = c[keep]
    return rule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--vin', type=int, default=3072)
    ap.add_argument('--vout', type=int, default=0, help='0 = same as vin')
    ap.add_argument('--cin', type=int, default=64)
    ap.add_argument('--cout', type=int, default=64)
    ap.add_argument('--k', type=int, default=27)
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()
    vo = args.vout or args.vin

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.ops import sparse_conv_tpu as sct

    rng = np.random.RandomState(0)
    rule = jnp.asarray(make_rulebook(rng, args.b, args.vin, vo, args.k))
    f = jnp.asarray(rng.randn(args.b, args.vin, args.cin), jnp.bfloat16)
    w = jnp.asarray(rng.randn(args.k, args.cin, args.cout) * 0.1, jnp.bfloat16)

    def bench(fn, label):
        @jax.jit
        def chain(f, n):
            def body(_, carry):
                ff = f.at[0, 0, 0].add(carry * 1e-12)
                return fn(ff, rule, w).reshape(-1)[0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
            _ = float(chain(f, 2))
            t0 = time.perf_counter()
            _ = float(chain(f, args.iters))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(chain(f, args.iters * 3))
            t2 = time.perf_counter() - t0
            ms = (t2 - t1) / (args.iters * 2) * 1000
            print(f'{label:<36}{ms:>9.3f} ms', flush=True)
        except Exception as e:
            print(f'{label:<36} FAIL {type(e).__name__}: {e}'[:120],
                  flush=True)

    bench(sct.rulebook_conv_pallas, 'v1 t1024/b256/w5')
    for t, b_, nw in ((256, 128, 4), (256, 128, 3), (512, 128, 5),
                      (512, 128, 4), (512, 256, 3), (128, 128, 3),
                      (256, 64, 5), (256, 64, 6), (128, 64, 4),
                      (128, 64, 5)):
        kz = 3 if args.k % 3 == 0 else 1
        bench(functools.partial(sct.rulebook_conv_pallas_v3, kernel_z=kz,
                                t_out=t, blk=b_, n_wg=nw),
              f'v3 t{t}/b{b_}/w{nw}')


if __name__ == '__main__':
    main()
