"""Isolated TPU micro-benchmarks for the PointPillar hot stages.

Each case times an on-device fori_loop chain (one dispatch, one scalar
fetch) like tools/profile_stages.py, so axon-tunnel dispatch overhead is
excluded. Used to pick kernel/layout variants; results recorded in commit
messages.

Usage: python tools/microbench.py [--case conv|vfe|scatter|nms|all]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20, warm=2):
    """fn must be a jitted (args..., n) -> scalar chain."""
    import jax  # noqa: F401
    _ = float(fn(*args, warm))
    t0 = time.perf_counter()
    _ = float(fn(*args, iters))
    return (time.perf_counter() - t0) / iters * 1000


def chain(step, leaf_scalar=None):
    """Wrap step(x, carry)->tree into a fori_loop chain over a carry."""
    import jax
    import jax.numpy as jnp

    if leaf_scalar is None:
        def leaf_scalar(tree):
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, 'dtype') and jnp.issubdtype(
                        leaf.dtype, jnp.floating):
                    tot = tot + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
            return tot

    @jax.jit
    def run(args, n):
        def body(_, carry):
            out = step(args, carry)
            return leaf_scalar(out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return run


def bench_conv(batch=8):
    """BEV backbone conv stack: layouts and paddings."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def conv_stack(h, w, cin=64):
        """Mimic BaseBEVBackbone pointpillar cfg: blocks [3,5,5], strides
        [2,2,2], filters [64,128,256], upsample [1,2,4] -> 128 each."""
        specs = []
        params = []
        c = cin
        for nf, nlayer, stride in [(64, 3, 2), (128, 5, 2), (256, 5, 2)]:
            specs.append(('conv', c, nf, 3, stride))
            c = nf
            for _ in range(nlayer):
                specs.append(('conv', c, nf, 3, 1))
        for i, (nf, us) in enumerate([(64, 1), (128, 2), (256, 4)]):
            specs.append(('deconv', nf, 128, us, us))
        for kind, ci, co, k, s in specs:
            params.append(jnp.asarray(
                rng.randn(k, k, ci, co).astype(np.float32) * 0.05,
                dtype=jnp.bfloat16))
        x = jnp.asarray(rng.randn(batch, h, w, cin).astype(np.float32),
                        dtype=jnp.bfloat16)

        def fwd2(x, params):
            pi = 0
            xi = x
            ups = []
            for bi, (nf, nlayer, stride) in enumerate(
                    [(64, 3, 2), (128, 5, 2), (256, 5, 2)]):
                for li in range(1 + nlayer):
                    wgt = params[pi]
                    pi += 1
                    s = stride if li == 0 else 1
                    xi = jax.lax.conv_general_dilated(
                        xi, wgt, (s, s), [(1, 1), (1, 1)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                    xi = jnp.maximum(xi, 0)
                ups.append(xi)
            outs = []
            for bi, us in enumerate([1, 2, 4]):
                wgt = params[pi]
                pi += 1
                o = jax.lax.conv_transpose(
                    ups[bi], wgt, (us, us), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                outs.append(jnp.maximum(o, 0))
            return jnp.concatenate(outs, axis=-1)

        def step2(args, carry):
            x, params = args
            return fwd2(x + carry.astype(x.dtype), params)

        return chain(step2), (x, tuple(params))

    for h, w in [(496, 432), (512, 448), (512, 512)]:
        fn, args = conv_stack(h, w)
        ms = timed(fn, args)
        # FLOPs for this stack
        print(f'conv bev {h}x{w} b{batch}: {ms:.2f} ms/batch')


def bench_matmul():
    """Calibrate achievable bf16 matmul TFLOP/s on this chip."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for m, k, n in [(4096, 4096, 4096), (8192, 2048, 2048),
                    (53568 * 8 // 64 * 64, 576, 64), (53568, 576, 128)]:
        a = jnp.asarray(rng.randn(m, k).astype(np.float32), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.randn(k, n).astype(np.float32), dtype=jnp.bfloat16)

        def step(args, carry):
            a, b = args
            return (a + carry.astype(a.dtype)) @ b

        ms = timed(chain(step), (a, b))
        tf = 2 * m * k * n / (ms / 1e3) / 1e12
        print(f'matmul {m}x{k}x{n} bf16: {ms:.3f} ms = {tf:.1f} TFLOP/s')


def bench_conv_blocks(batch=8):
    """Individual BEV-backbone conv layers: find where MFU is lost."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    cases = [
        ('b1 s2 64->64 @496x432', 496, 432, 64, 64, 3, 2),
        ('b1 s1 64->64 @248x216', 248, 216, 64, 64, 3, 1),
        ('b1 s1 128->128 @248x216', 248, 216, 128, 128, 3, 1),
        ('b2 s2 64->128 @248x216', 248, 216, 64, 128, 3, 2),
        ('b2 s1 128->128 @124x108', 124, 108, 128, 128, 3, 1),
        ('b3 s1 256->256 @62x54', 62, 54, 256, 256, 3, 1),
        ('b3 s1 256->256 @64x64', 64, 64, 256, 256, 3, 1),
    ]
    for name, h, w, ci, co, k, s in cases:
        x = jnp.asarray(rng.randn(batch, h, w, ci).astype(np.float32),
                        dtype=jnp.bfloat16)
        wgt = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * .05,
                          dtype=jnp.bfloat16)

        def step(args, carry):
            x, wgt = args
            y = jax.lax.conv_general_dilated(
                x + carry.astype(x.dtype), wgt, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return jnp.maximum(y, 0)

        ms = timed(chain(step), (x, wgt))
        flops = 2 * batch * (h // s) * (w // s) * ci * co * k * k
        tf = flops / (ms / 1e3) / 1e12
        print(f'conv {name}: {ms:.3f} ms = {tf:.1f} TFLOP/s')


def bench_vfe(batch=8, v=40960, p=32, c=64):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    vox = jnp.asarray(rng.rand(batch, v, p, 4).astype(np.float32))
    ctr = jnp.asarray(rng.rand(batch, v, 4).astype(np.float32))
    pb = jnp.asarray(rng.rand(batch, v, c).astype(np.float32))
    counts = jnp.asarray(
        rng.randint(0, p + 1, size=(batch, v)).astype(np.int32))
    w4 = jnp.asarray(rng.randn(4, c).astype(np.float32) * 0.1)
    shift = jnp.asarray(rng.randn(c).astype(np.float32))

    def xla_path(args, carry):
        vox, ctr, pb, counts, w4, shift = args
        cdt = jnp.bfloat16
        xc = vox + carry - ctr[:, :, None, :]
        z = xc.astype(cdt) @ w4.astype(cdt) + pb[:, :, None].astype(cdt)
        rows = jnp.arange(p)[None, None, :]
        neg = jnp.asarray(-jnp.inf, z.dtype)
        z = jnp.where((rows < counts[..., None])[..., None], z, neg)
        m = z.max(axis=2)
        pad_val = jnp.where((counts < p)[..., None],
                            shift[None, None].astype(z.dtype), neg)
        return jax.nn.relu(jnp.maximum(m, pad_val)).astype(cdt)

    ms = timed(chain(xla_path), (vox, ctr, pb, counts, w4, shift))
    print(f'vfe xla b{batch} v{v}: {ms:.2f} ms/batch')

    # point-list formulation: (B, N, 4) @ (4, C) + segment-max via sorted keys
    n_pts = 32768
    pts = jnp.asarray(rng.rand(batch, n_pts, 4).astype(np.float32))

    def ptlist(args, carry):
        pts, w4 = args
        cdt = jnp.bfloat16
        z = (pts + carry).astype(cdt) @ w4.astype(cdt)
        return z

    ms = timed(chain(ptlist), (pts, w4))
    print(f'vfe point-matmul-only b{batch} n{n_pts}: {ms:.2f} ms/batch')


def bench_scatter(batch=8, v=40960, c=64, n_slots=496 * 432):
    import jax
    import jax.numpy as jnp

    from lidardetection_tpu.ops.scatter_tpu import (_scatter_pallas,
                                                    _tile_starts)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(batch, v, c).astype(np.float32),
                        dtype=jnp.bfloat16)
    keys_np = np.sort(rng.choice(n_slots, size=(batch, v), replace=True),
                      axis=1).astype(np.int32)
    keys = jnp.asarray(keys_np)

    def full(args, carry):
        feats, keys = args
        return _scatter_pallas(feats + carry.astype(feats.dtype), keys,
                               n_slots)

    ms = timed(chain(full), (feats, keys))
    print(f'scatter pallas full b{batch}: {ms:.2f} ms/batch')

    def starts_only(args, carry):
        feats, keys = args
        kt = 256 * 16
        v_pad = (v // kt + 2) * kt
        k2 = jnp.concatenate(
            [keys + jnp.int32(carry * 0), jnp.full((batch, v_pad - v),
                                                   n_slots, jnp.int32)],
            axis=1)
        t_steps = -(-n_slots // kt)
        return _tile_starts(k2, t_steps * 16, 256).astype(jnp.float32)

    ms = timed(chain(starts_only), (feats, keys))
    print(f'scatter starts-only b{batch}: {ms:.2f} ms/batch')


def bench_nms(batch=8, n=4096):
    import jax
    import jax.numpy as jnp

    from lidardetection_tpu.core.iou3d import nms_bev_batched

    rng = np.random.RandomState(0)
    # plausible KITTI-like boxes
    xy = rng.rand(batch, n, 2).astype(np.float32) * 60
    wh = 1.5 + rng.rand(batch, n, 2).astype(np.float32) * 2.5
    boxes = np.concatenate([
        xy, np.zeros((batch, n, 1), np.float32),
        wh, 1.5 * np.ones((batch, n, 1), np.float32),
        rng.rand(batch, n, 1).astype(np.float32) * np.pi], axis=2)
    scores_np = np.sort(rng.rand(batch, n).astype(np.float32))[:, ::-1].copy()
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores_np)

    def run(args, carry):
        boxes, scores = args
        idx, mask, num = nms_bev_batched(
            boxes, scores + carry, 0.01, n, 500, assume_sorted=True)
        return num.astype(jnp.float32)

    ms = timed(chain(run), (boxes, scores), iters=10)
    print(f'nms b{batch} n{n} thresh 0.01: {ms:.2f} ms/batch')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--case', default='all')
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()
    if args.case in ('matmul', 'all'):
        bench_matmul()
    if args.case in ('convblocks', 'all'):
        bench_conv_blocks(args.batch)
    if args.case in ('conv', 'all'):
        bench_conv(args.batch)
    if args.case in ('vfe', 'all'):
        bench_vfe(args.batch)
    if args.case in ('scatter', 'all'):
        bench_scatter(args.batch)
    if args.case in ('nms', 'all'):
        bench_nms(args.batch)


if __name__ == '__main__':
    main()
