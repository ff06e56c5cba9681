"""Per-op TPU timing of the VSA (PFE) internals at PV-RCNN eval shapes.

Times sector FPS, each SA source's grid ball query (multi-radius), the
group+MLP stacks, and the BEV bilinear interpolation in isolation —
the complement of tools/profile_stages.py for the keypoint path.
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
    ap.add_argument('--iters', type=int, default=20)
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
        print(f'{label:<34}{(t2 - t1) / (args.iters * 2) * 1000:>9.2f} ms',
              flush=True)

    raw = mkpts(32768)
    nraw = jnp.full((B,), 32000, jnp.int32)
    timed('sector_fps 32768->2048',
          lambda pts: p2.sector_fps(pts, nraw, M, 32), raw)

    kp = mkpts(M)
    kv = jnp.ones((B, M), bool)
    sources = [('raw_points', 32768, (0.4, 0.8), (16, 16)),
               ('x_conv1', 20480, (0.4, 0.8), (16, 16)),
               ('x_conv2', 32768, (0.8, 1.2), (16, 32)),
               ('x_conv3', 24576, (1.2, 2.4), (16, 32)),
               ('x_conv4', 16384, (2.4, 4.8), (16, 32))]
    for name, n, radii, ns in sources:
        src = mkpts(n)
        nn = jnp.full((B,), n - 128, jnp.int32)
        timed(f'grid_bq_multi {name} V={n}',
              lambda s, c: p2.grid_ball_query_multi(
                  radii, ns, s, nn, c, kv, bounds=bounds,
                  cell_cap=args.cell_cap),
              src, kp)

    # group_points at the grouped-feature shape (the SA gather)
    feats = jnp.asarray(rng.standard_normal((B, 32768, 64), np.float32))
    idx = jnp.asarray(rng.integers(0, 32768, (B, M, 32)), jnp.int32)
    timed('group_points (B,2048,32) of C=64',
          lambda f, i: p2.group_points(f, i), feats, idx)


if __name__ == '__main__':
    main()
