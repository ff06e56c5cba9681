"""Micro-bench: 3x3 Conv MFU at the BEV backbone's shapes on the chip.

Times each conv shape as an on-device fori_loop chain (one dispatch + one
scalar fetch, slope-timed) and prints achieved TFLOP/s vs the v5e bf16 peak
(~197). Used to locate where backbone_2d loses MFU (dense BEV backbone,
reference base_bev_backbone.py:6-112).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(args.dtype)
    B = args.batch

    # (name, H, W, cin, cout, stride, transpose)
    cases = [
        ('b1 stride', 496, 432, 64, 64, 2, False),
        ('b1 conv', 248, 216, 64, 64, 1, False),
        ('b2 stride', 248, 216, 64, 128, 2, False),
        ('b2 conv', 124, 108, 128, 128, 1, False),
        ('b3 stride', 124, 108, 128, 256, 2, False),
        ('b3 conv', 62, 54, 256, 256, 1, False),
        ('b1 conv pad512', 256, 224, 64, 64, 1, False),
        ('b1 conv c128', 248, 216, 128, 128, 1, False),
        ('b2 conv pad', 128, 112, 128, 128, 1, False),
        ('b3 conv pad', 64, 56, 256, 256, 1, False),
    ]

    print(f'{"case":<18}{"ms":>9}{"GFLOP":>9}{"TF/s":>8}{"MFU%":>7}')
    for name, h, w, cin, cout, stride, _tr in cases:
        x = jnp.ones((B, h, w, cin), dt)
        k = jnp.ones((3, 3, cin, cout), dt) * 0.01

        def conv(x):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        @jax.jit
        def chain(x, n):
            def body(_, carry):
                # carry a FULL reduction of y: a single-element carry lets
                # XLA push the slice through the conv and compute one pixel
                y = conv(x + carry.astype(x.dtype) * 1e-9)
                return jnp.sum(y, dtype=jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        _ = float(chain(x, 2))
        n1, n2 = 20, 80
        t0 = time.perf_counter(); _ = float(chain(x, n1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(chain(x, n2)); t2 = time.perf_counter() - t0
        dtms = (t2 - t1) / (n2 - n1) * 1000
        oh, ow = h // stride, w // stride
        gflop = 2 * B * oh * ow * 9 * cin * cout / 1e9
        tfs = gflop / dtms
        print(f'{name:<18}{dtms:>9.3f}{gflop:>9.1f}{tfs:>8.1f}{100 * tfs / PEAK_TFLOPS:>7.1f}')


if __name__ == '__main__':
    main()
