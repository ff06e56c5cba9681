"""On-chip numerical verification of every Pallas kernel.

Runs each kernel on the REAL TPU at realistic shapes against its exact
CPU/XLA reference formulation and prints per-kernel max abs error — the
check that interpret-mode pins cannot provide (a Mosaic-vs-interpret
divergence would otherwise ship silently into every benched number).

    python tools/verify_tpu.py            # all kernels; exit 1 on failure
    python bench.py --verify              # same, before benching

Covered: rulebook conv v1/v3 (+ dW), ball_select (grid ball query),
pillar-scatter, fused eval VFE, RoI candidate rank-select einsum.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAILED = []


def check(name, got, want, atol=2e-2, rtol=2e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1.0)
    bad = err > atol + rtol * denom
    maxerr = float(err.max()) if err.size else 0.0
    status = 'ok  ' if not bad.any() else 'FAIL'
    print(f'{status} {name:<44} max_abs_err={maxerr:.3e} '
          f'bad={int(bad.sum())}/{bad.size}', flush=True)
    if bad.any():
        FAILED.append(name)


def verify_rulebook_conv():
    import jax
    import jax.numpy as jnp

    from lidardetection_tpu.ops import sparse, sparse_conv_tpu
    from tools.microbench_rbconv import make_rulebook

    rng = np.random.RandomState(0)
    b, vi, c, co = 4, 8192, 32, 32
    rule = jnp.asarray(make_rulebook(rng, b, vi, vi))
    f = jnp.asarray(rng.randn(b, vi, c), jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, c, co) * 0.1, jnp.bfloat16)
    valid = jnp.ones((b, vi), bool)

    ref = sparse._conv_apply_xla(f, valid, rule, w)
    check('rulebook_conv v3 (C32, V8k)',
          sparse_conv_tpu.rulebook_conv_pallas_v3(f, rule, w),
          ref, atol=0.35, rtol=0.05)  # bf16 27-term dot
    check('rulebook_conv v1 (C32, V8k)',
          sparse_conv_tpu.rulebook_conv_pallas(f, rule, w),
          ref, atol=0.35, rtol=0.05)

    g = jnp.asarray(rng.randn(b, vi, co), jnp.bfloat16)

    def loss(w2):
        return jnp.sum(sparse._conv_apply_xla(
            f.astype(jnp.float32), valid, rule, w2) * g.astype(jnp.float32))

    dw_ref = jax.grad(loss)(w.astype(jnp.float32))
    dw = sparse_conv_tpu.rulebook_conv_dw_pallas(f, rule, g)
    check('rulebook_conv dW (C32, V8k)', dw, dw_ref, atol=2.0, rtol=0.05)


def verify_ball_select(shape='vsa'):
    import jax.numpy as jnp

    from lidardetection_tpu.ops import pointnet2 as p2

    rng = np.random.default_rng(1)
    bounds = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    if shape == 'vsa':
        B, N, M = 4, 16384, 1024
        radii, ns = (0.8, 1.2), (16, 32)

        def mkpts(n):
            return jnp.asarray(np.stack(
                [rng.uniform(0, 69, (B, n)), rng.uniform(-39, 39, (B, n)),
                 rng.uniform(-3, 1, (B, n))], -1), jnp.float32)

        src, ctr = mkpts(N), mkpts(M)
    else:
        # PointRCNN SA1 shape with CLUSTERED sources so many grid cells
        # overflow cell_cap (the occupancy pattern round 3 suspected):
        # 64 tight clusters absorb half the points, the rest uniform
        B, N, M = 8, 16384, 4096
        radii, ns = (0.1, 0.5), (16, 32)
        cl = rng.uniform([2, -35, -2.5], [65, 35, 0.5], (B, 64, 3))
        which = rng.integers(0, 64, (B, N // 2))
        clustered = (np.take_along_axis(cl, which[..., None], axis=1)
                     + rng.normal(0, 0.15, (B, N // 2, 3)))
        uniform = np.stack(
            [rng.uniform(0, 69, (B, N // 2)),
             rng.uniform(-39, 39, (B, N // 2)),
             rng.uniform(-3, 1, (B, N // 2))], -1)
        src = jnp.asarray(np.concatenate([clustered, uniform], 1),
                          jnp.float32)
        ctr_idx = rng.integers(0, N, (B, M))
        ctr = jnp.asarray(np.take_along_axis(
            np.asarray(src), ctr_idx[..., None], axis=1), jnp.float32)
    nn = jnp.full((B,), N - 64, jnp.int32)
    kv = jnp.ones((B, M), bool)
    # TPU path (Pallas select) vs the exact CPU formulation (top_k two-stage)
    got = p2.grid_ball_query_multi(radii, ns, src, nn, ctr, kv,
                                   bounds=bounds, cell_cap=64)
    import jax
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        pass  # CPU fallback runs automatically off-TPU; emulate via numpy:
    # reference: brute-force first-nsample-by-index per center. The
    # clustered shape overflows the 64-point cell cap BY DESIGN (the
    # documented drop-the-excess approximation), so its check relaxes to
    # the corruption-catching necessary conditions: every selected index
    # is a true in-radius hit (an OOB window read would surface garbage
    # indices/coords here) and no-hit centers are flagged empty.
    cap_exact = shape == 'vsa'
    sn, cn = np.asarray(src), np.asarray(ctr)
    nv = np.asarray(nn)
    for ri, (r, k) in enumerate(zip(radii, ns)):
        gi, ge = (np.asarray(x) for x in got[ri])
        # sampled spot-check (full brute force is O(B*M*N))
        sel = rng.integers(0, M, 200)
        bad = 0
        for bi in range(B):
            d2 = ((sn[bi, :nv[bi], None, :]
                   - cn[bi, sel][None, :, :]) ** 2).sum(-1)  # (N, 200)
            for j, m in enumerate(sel):
                hits = np.where(d2[:, j] < r * r)[0]
                want = set(hits[:k]) if len(hits) else set()
                gotset = set(gi[bi, m][:min(k, max(len(hits), 1))]) \
                    if len(hits) else None
                if len(hits) == 0:
                    bad += 0 if ge[bi, m] else 1
                elif not cap_exact:
                    bad += 0 if (ge[bi, m]
                                 or set(gi[bi, m]).issubset(set(hits))) else 1
                elif len(hits) >= k:
                    # surplus: require all selected are true hits
                    bad += 0 if set(gi[bi, m]).issubset(set(hits)) else 1
                else:
                    bad += 0 if gotset == want else 1
        tag = '' if cap_exact else ' (cap-relaxed)'
        print(f'{"ok  " if bad == 0 else "FAIL"} '
              f'ball_select[{shape}] r={r} ns={k}{tag:<14} '
              f'mismatched_centers={bad}/{B * 200}', flush=True)
        if bad:
            FAILED.append(f'ball_select {shape} r={r}')


def verify_scatter():
    import jax.numpy as jnp

    from lidardetection_tpu.ops import scatter_tpu

    rng = np.random.default_rng(2)
    B, V, C, S = 4, 16384, 64, 214272
    n = 12000
    keys = np.full((B, V), S, np.int32)
    for bi in range(B):
        k = np.sort(rng.choice(S, n, replace=False)).astype(np.int32)
        keys[bi, :n] = k
    feats = rng.standard_normal((B, V, C)).astype(np.float32)
    out = scatter_tpu.scatter_rows_sorted(
        jnp.asarray(feats), jnp.asarray(keys), S)
    want = np.zeros((B, S, C), np.float32)
    for bi in range(B):
        want[bi, keys[bi, :n]] = feats[bi, :n]
    check('pillar scatter (V16k -> 214k slots)', out, want, atol=1e-3)


def verify_vfe():
    import jax.numpy as jnp

    from lidardetection_tpu.ops import vfe_tpu

    # mirrors the REAL call (models/backbones_3d/vfe.py:208): 4-column
    # ctr4 = [center xyz, 0], w4 (4, C), pillar_bias (B, V, C), and counts
    # that include empty pillars (round 3 shipped a 3-column/10-row harness
    # that TypeErrored before this check ever ran)
    rng = np.random.default_rng(3)
    B, V, P, C = 2, 4096, 32, 64
    vox4 = rng.standard_normal((B, V, P, 4)).astype(np.float32)
    ctr4 = np.concatenate(
        [rng.standard_normal((B, V, 3)), np.zeros((B, V, 1))],
        axis=-1).astype(np.float32)
    pillar_bias = rng.standard_normal((B, V, C)).astype(np.float32)
    counts = rng.integers(0, P + 1, (B, V)).astype(np.int32)
    w4 = (rng.standard_normal((4, C)) * 0.1).astype(np.float32)
    shift = rng.standard_normal((C,)).astype(np.float32)
    got = vfe_tpu.pillar_vfe_fused(
        jnp.asarray(vox4), jnp.asarray(ctr4), jnp.asarray(pillar_bias),
        jnp.asarray(counts), jnp.asarray(w4), jnp.asarray(shift),
        out_dtype=jnp.float32)
    # pure-numpy reference of the fused algebra (f32; kernel runs bf16)
    xc = vox4 - ctr4[:, :, None, :]
    z = xc @ w4 + pillar_bias[:, :, None, :]
    rows = np.arange(P)[None, None, :, None]
    z = np.where(rows < counts[:, :, None, None], z, -np.inf)
    m = z.max(axis=2)
    pad_val = np.where((counts < P)[..., None], shift[None, None], -np.inf)
    want = np.maximum(np.maximum(m, pad_val), 0.0)
    check('fused eval VFE (V4k, P32, C64)', got, want, atol=5e-2, rtol=2e-2)


def verify_rank_select():
    import jax.numpy as jnp

    from lidardetection_tpu.ops import pointnet2 as p2

    rng = np.random.default_rng(4)
    B, R, K, G, ns = 2, 32, 128, 27, 16
    cand = rng.uniform(-3, 3, (B, R, K, 3)).astype(np.float32)
    live = rng.uniform(size=(B, R, K)) < 0.8
    grid = rng.uniform(-2, 2, (B, R, G, 3)).astype(np.float32)
    sel, empty = p2.candidate_rank_select(
        jnp.asarray(cand), jnp.asarray(live), jnp.asarray(grid), 1.5, ns)
    sel, empty = np.asarray(sel), np.asarray(empty)
    bad = 0
    for bi in range(B):
        for r in range(R):
            for g in range(G):
                d2 = ((cand[bi, r] - grid[bi, r, g]) ** 2).sum(-1)
                hits = np.where(live[bi, r] & (d2 < 1.5 ** 2))[0]
                if len(hits) == 0:
                    bad += 0 if empty[bi, r, g] else 1
                    continue
                want = list(hits[:ns]) + [hits[0]] * max(0, ns - len(hits))
                got = sel[bi, r, g].argmax(-1)
                bad += 0 if list(got) == want else 1
    print(f'{"ok  " if bad == 0 else "FAIL"} '
          f'roi rank-select{"":<30} mismatched_slots={bad}/{B*R*G}',
          flush=True)
    if bad:
        FAILED.append('roi rank-select')


def verify_iou3d():
    """Rotated IoU on chip vs the exact CPU geometry, with a deliberate
    cluster of near-identical pairs.

    Guard for the round-5 root cause of the PV-RCNN "refinement
    inversion": einsums in core/iou3d.py lowered to MXU dots whose TPU
    default operand precision is bf16; the collinear-edge tie handling
    then exploded for (near-)identical boxes (self-IoU read 0.33 or 1e7
    on chip while every CPU test passed). Any future re-introduction of
    a dot into the clip path fails here first.
    """
    import jax.numpy as jnp

    from lidardetection_tpu.core.iou3d import boxes_iou3d
    from lidardetection_tpu.core.np_geometry import boxes_bev_iou_cpu

    rng = np.random.default_rng(7)
    n = 96
    base = np.concatenate([
        rng.uniform(-60, 60, (n, 2)), rng.uniform(-2, 2, (n, 1)),
        rng.uniform(1.5, 4.5, (n, 2)), rng.uniform(1.2, 2.0, (n, 1)),
        rng.uniform(-np.pi, np.pi, (n, 1))], axis=1).astype(np.float32)
    # half the probes: the SAME boxes jittered by millimeters (the regime
    # a converged two-stage head produces)
    jit = base.copy()
    jit[: n // 2, :3] += rng.normal(0, 2e-3, (n // 2, 3))
    jit[: n // 2, 6] += rng.normal(0, 1e-4, n // 2)
    got = np.asarray(boxes_iou3d(jnp.asarray(base), jnp.asarray(jit)))

    # exact CPU reference: rotated BEV IoU -> 3D with z-extent
    bev = boxes_bev_iou_cpu(base, jit)
    area_a = (base[:, 3] * base[:, 4])[:, None]
    area_b = (jit[:, 3] * jit[:, 4])[None, :]
    ov_bev = bev * (area_a + area_b) / (1.0 + bev)
    za1, za2 = base[:, 2] - base[:, 5] / 2, base[:, 2] + base[:, 5] / 2
    zb1, zb2 = jit[:, 2] - jit[:, 5] / 2, jit[:, 2] + jit[:, 5] / 2
    zov = np.clip(np.minimum(za2[:, None], zb2[None, :])
                  - np.maximum(za1[:, None], zb1[None, :]), 0, None)
    ov3d = ov_bev * zov
    vol_a = (base[:, 3] * base[:, 4] * base[:, 5])[:, None]
    vol_b = (jit[:, 3] * jit[:, 4] * jit[:, 5])[None, :]
    want = ov3d / np.clip(vol_a + vol_b - ov3d, 1e-6, None)
    check('boxes_iou3d (near-identical cluster)', got, want,
          atol=5e-3, rtol=5e-3)
    diag = np.diagonal(got)[n // 2:]  # exact self-pairs
    check('boxes_iou3d self-IoU == 1', diag, np.ones_like(diag),
          atol=1e-3, rtol=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kernels', default='conv,ball,scatter,vfe,rank,iou')
    args = ap.parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    if jax.devices()[0].platform != 'tpu':
        print('WARNING: not on TPU — this verifies the fallback paths only',
              file=sys.stderr)
    todo = set(args.kernels.split(','))
    if 'conv' in todo:
        verify_rulebook_conv()
    if 'ball' in todo:
        verify_ball_select('vsa')
        verify_ball_select('prcnn')
    if 'scatter' in todo:
        verify_scatter()
    if 'vfe' in todo:
        verify_vfe()
    if 'rank' in todo:
        verify_rank_select()
    if 'iou' in todo:
        verify_iou3d()
    if FAILED:
        print('FAILED:', ', '.join(FAILED))
        sys.exit(1)
    print('all kernels verified on', jax.devices()[0].platform)


if __name__ == '__main__':
    main()
