"""Exactness tests for the width-paired BEV conv path and the k==stride
deblock rewrite (models/layers.py). Reference semantics: 3x3 Conv(pad=1)
+ BN + ReLU and ConvTranspose(k=s) blocks of base_bev_backbone.py:25-44.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidardetection_tpu.models.layers import (
    ConvBNReLU, MaskedBatchNorm, PairedConvBNReLU, pair_w, unpair_w)


def _direct_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('stride', [1, 2])
def test_paired_conv_matches_direct(stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
    mod = PairedConvBNReLU(64, stride, use_running_average=True)
    variables = mod.init(jax.random.PRNGKey(0), pair_w(x))
    w = variables['params']['kernel']

    out2 = mod.apply(variables, pair_w(x))
    out = unpair_w(out2)

    ref = _direct_conv(x, w, stride)
    # eval BN with fresh stats = affine with scale/rsqrt(1+eps), shift 0
    ref = jnp.maximum(ref * jax.lax.rsqrt(1.0 + 1e-3), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paired_upstride_unpaired_out():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
    mod = PairedConvBNReLU(128, 2, unpaired_out=True,
                           use_running_average=True)
    variables = mod.init(jax.random.PRNGKey(0), pair_w(x))
    w = variables['params']['kernel']

    out = mod.apply(variables, pair_w(x))
    ref = _direct_conv(x, w, 2)
    ref = jnp.maximum(ref * jax.lax.rsqrt(1.0 + 1e-3), 0.0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paired_bn_train_stats_match_unpaired():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 12, 32).astype(np.float32))
    bn = MaskedBatchNorm(use_running_average=False)
    bn2 = MaskedBatchNorm(use_running_average=False, repeats=2)
    v1 = bn.init(jax.random.PRNGKey(0), x)
    v2 = bn2.init(jax.random.PRNGKey(0), pair_w(x))
    y1, m1 = bn.apply(v1, x, mutable=['batch_stats'])
    y2, m2 = bn2.apply(v2, pair_w(x), mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(m1['batch_stats']['mean']),
                               np.asarray(m2['batch_stats']['mean']),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1['batch_stats']['var']),
                               np.asarray(m2['batch_stats']['var']),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(unpair_w(y2)), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('k', [1, 2, 4])
def test_deblock_matches_conv_transpose(k):
    """The 1x1-conv + depth-to-space form == ConvTranspose(k=s, VALID)."""
    rng = np.random.RandomState(3)
    cin, cout = 8, 16
    x = jnp.asarray(rng.randn(2, 6, 5, cin).astype(np.float32))
    mod = ConvBNReLU(cout, k, k, transpose=True, use_running_average=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    w2 = variables['params']['Conv_0']['kernel']  # (1, 1, cin, cout*k*k)

    out = mod.apply(variables, x)

    # map to ConvTranspose kernel (k, k, cin, cout): channel index =
    # dy*k*cout + dx*cout + co; lax.conv_transpose(transpose_kernel=False)
    # places tap (dy, dx) at kernel slot (k-1-dy, k-1-dx) (per-tap params
    # are independent for k == s, so the orientations are the same model
    # class — this mapping only aligns the comparison)
    wt = w2.reshape(cin, k, k, cout).transpose(1, 2, 0, 3)[::-1, ::-1]
    ref = jax.lax.conv_transpose(
        x, wt, (k, k), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ref = jnp.maximum(ref * jax.lax.rsqrt(1.0 + 1e-3), 0.0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
