"""Shared flax building blocks.

The reference uses torch BatchNorm(eps=1e-3, momentum=0.01) everywhere
(e.g. pillar_vfe.py:23, base_bev_backbone.py:31). torch momentum 0.01 ==
flax momentum 0.99 (flax: ra = m*ra + (1-m)*batch).

`MaskedBatchNorm` exists because this framework runs with fixed capacities:
padding rows (empty pillars, padded voxels) would pollute batch statistics
that the reference — which operates on dynamically-sized real data — never
sees. Statistics are computed over mask-weighted entries only, optionally
synchronized across a mesh axis (the TPU-native replacement for
torch SyncBatchNorm, tools/train.py:116-117).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # flax convention; == torch momentum 0.01


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all-but-last axes with an entry validity mask.

    Args at call: x (..., C), mask broadcastable to x[..., 0] (1 = count this
    entry in the statistics). Padding entries are still *normalized* (with
    the valid stats) so downstream masking decides their fate — mirroring how
    the reference normalizes every real entry.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (features,))
        bias = self.param('bias', nn.initializers.zeros, (features,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                reduce_axes = tuple(range(x.ndim - 1))
                cnt = jnp.asarray(
                    jnp.prod(jnp.asarray([x.shape[a] for a in reduce_axes])),
                    jnp.float32)
                s1 = jnp.sum(xf, axis=reduce_axes)
                s2 = jnp.sum(xf * xf, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1)))
                s2 = jnp.sum(xf * xf * m, axis=tuple(range(x.ndim - 1)))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        # fold into a per-channel affine computed in f32, applied in the
        # input dtype: broadcasting f32 (mean/inv/bias) against bf16 x would
        # promote the whole tensor to f32 — measured 2.5x slowdown of the
        # full BEV backbone from the extra f32 materializations alone
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class ConvBNReLU(nn.Module):
    """Conv2d(kernel, stride, no bias) + BN + ReLU, NHWC.

    `dtype` is the compute dtype (bfloat16 targets the MXU; params stay
    float32 and BN statistics accumulate in float32 regardless).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: object = 1
    use_running_average: bool = False
    axis_name: str | None = None
    transpose: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, use_running_average=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.transpose:
            # NOTE perf: rewriting the k==s deblocks as 1x1 conv +
            # depth-to-space looked faster in isolation but cost +0.7 ms on
            # the full BEV backbone on-chip (the 6D transpose breaks XLA's
            # fusion; measured 2026-08-18). Plain ConvTranspose lowers well.
            k = self.kernel_size
            x = nn.ConvTranspose(
                self.features, (k, k),
                strides=(self.stride, self.stride), padding='VALID',
                use_bias=False, dtype=self.dtype)(x)
        else:
            pad = self.padding
            if isinstance(pad, int):
                pad = [(pad, pad), (pad, pad)]
            x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride), padding=pad,
                        use_bias=False, dtype=self.dtype)(x)
        x = MaskedBatchNorm(use_running_average=self.use_running_average
                            if use_running_average is None else use_running_average,
                            axis_name=self.axis_name)(x)
        return nn.relu(x)
