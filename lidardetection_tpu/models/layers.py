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
    repeats: int = 1  # x's channel axis holds `repeats` copies of the
    # logical channels (lane-packed layouts, e.g. width-paired convs);
    # stats/params stay per logical channel

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average
        )
        features = x.shape[-1] // self.repeats
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
            if self.repeats > 1:
                # fold the repeated copies into the logical channels
                cnt = cnt * self.repeats
                s1 = jnp.sum(s1.reshape(self.repeats, features), axis=0)
                s2 = jnp.sum(s2.reshape(self.repeats, features), axis=0)
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
        if self.repeats > 1:
            inv = jnp.tile(inv, self.repeats)
            shift = jnp.tile(shift, self.repeats)
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
            k = self.kernel_size
            if k == self.stride:
                # kernel == stride transpose conv (every deblock in
                # base_bev_backbone.py): each input pixel owns a disjoint
                # k x k output block, so it is exactly a 1x1 conv to
                # features*k*k followed by depth-to-space. The direct
                # ConvTranspose lowering cost ~1.6 ms/batch of the BEV
                # backbone's 5.7 ms on v5e; this form is one full-lane
                # matmul + a layout shuffle. lecun_normal on the 1x1 kernel
                # also scales variance by the true fan-in (cin, not
                # cin*k*k — each output element sums cin terms only).
                x = nn.Conv(self.features * k * k, (1, 1), use_bias=False,
                            dtype=self.dtype)(x)
                b, h, w, _ = x.shape
                x = x.reshape(b, h, w, k, k, self.features)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h * k, w * k, self.features)
            else:
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


class PairedConvBNReLU(nn.Module):
    """3x3 Conv+BN+ReLU computed in a width-paired layout — exact math of
    ConvBNReLU, built for <=64-channel convs on TPU.

    A 64-channel conv fills only half the MXU's 128 output lanes (measured
    ~67 TF/s vs ~215 for 128 channels on v5e). Packing two adjacent W
    columns into the channel axis — (B, H, W, C) viewed as (B, H, W/2, 2C),
    a FREE reshape in NHWC — turns it into a 2C-channel conv with a
    structured kernel assembled from the logical (3, 3, cin, cout) param:
    output pair column p reads original columns 2wp+p-1 .. 2wp+p+1, which
    the paired taps cover exactly (zero-padding at the W edges matches the
    original conv's padding=1 zeros). BN statistics and affine are per
    LOGICAL channel (MaskedBatchNorm repeats=2), so params and batch_stats
    are layout-agnostic and the whole block (conv+BN+ReLU) runs paired with
    no relayout between layers.

    Modes (both consume paired input (B, H, W/2, 2*cin)):
      stride=1: paired output (B, H, W/2, 2*cout).
      stride=2: paired output (B, H/2, W/4, 2*cout) — H and W both halved,
        covering taps at original columns 4j+2p-1 .. 4j+2p+1.

    Replaces the reference's nn.Conv2d(3x3, s=1|2, pad=1) + BN + ReLU blocks
    (base_bev_backbone.py:25-44) bit-for-bit up to float reassociation.
    """

    features: int
    stride: int = 1
    unpaired_out: bool = False  # stride=2 only: emit plain (B, H/2, W/2, co)
    use_running_average: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x2, use_running_average=None):
        assert self.stride in (1, 2)
        ci = x2.shape[-1] // 2
        co = self.features
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (3, 3, ci, co))
        if self.dtype is not None:
            x2 = x2.astype(self.dtype)
        wd = w.astype(x2.dtype) if self.dtype is not None else w
        if self.unpaired_out:
            # stride-2, paired input, plain output (co >= 128 upstride
            # convs): out col 2j reads cols 2j-1 (wp j-1, p1), 2j (j, p0),
            # 2j+1 (j, p1) — 2 wp taps, stride 1 over wp, padding (1, 0).
            # 3/4 of the naive paired kernel's FLOPs and full output lanes.
            assert self.stride == 2
            k3 = jnp.zeros((3, 2, 2 * ci, co), wd.dtype)
            k3 = k3.at[:, 0, ci:, :].set(wd[:, 0])
            k3 = k3.at[:, 1, :ci, :].set(wd[:, 1])
            k3 = k3.at[:, 1, ci:, :].set(wd[:, 2])
            x2 = jax.lax.conv_general_dilated(
                x2, k3, (2, 1), [(1, 1), (1, 0)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x2 = MaskedBatchNorm(
                use_running_average=self.use_running_average
                if use_running_average is None else use_running_average,
                axis_name=self.axis_name)(x2)
            return nn.relu(x2)
        k2 = jnp.zeros((3, 3, 2 * ci, 2 * co), wd.dtype)
        if self.stride == 1:
            # out parity 0 <- (t0, p1)=dx-1, (t1, p0)=dx0, (t1, p1)=dx+1
            k2 = k2.at[:, 0, ci:, :co].set(wd[:, 0])
            k2 = k2.at[:, 1, :ci, :co].set(wd[:, 1])
            k2 = k2.at[:, 1, ci:, :co].set(wd[:, 2])
            # out parity 1 <- (t1, p0)=dx-1, (t1, p1)=dx0, (t2, p0)=dx+1
            k2 = k2.at[:, 1, :ci, co:].set(wd[:, 0])
            k2 = k2.at[:, 1, ci:, co:].set(wd[:, 1])
            k2 = k2.at[:, 2, :ci, co:].set(wd[:, 2])
        else:
            # out pair j, parity 0 = col 4j: taps cols 4j-1..4j+1
            #   <- (t0, p1), (t1, p0), (t1, p1)   [wp = 2j + t - 1]
            k2 = k2.at[:, 0, ci:, :co].set(wd[:, 0])
            k2 = k2.at[:, 1, :ci, :co].set(wd[:, 1])
            k2 = k2.at[:, 1, ci:, :co].set(wd[:, 2])
            # parity 1 = col 4j+2: taps cols 4j+1..4j+3
            #   <- (t1, p1), (t2, p0), (t2, p1)
            k2 = k2.at[:, 1, ci:, co:].set(wd[:, 0])
            k2 = k2.at[:, 2, :ci, co:].set(wd[:, 1])
            k2 = k2.at[:, 2, ci:, co:].set(wd[:, 2])
        x2 = jax.lax.conv_general_dilated(
            x2, k2, (self.stride, self.stride), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x2 = MaskedBatchNorm(use_running_average=self.use_running_average
                             if use_running_average is None else use_running_average,
                             axis_name=self.axis_name, repeats=2)(x2)
        return nn.relu(x2)


def pair_w(x):
    """(B, H, W, C) -> width-paired (B, H, W/2, 2C). Free in NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpair_w(x2):
    """Inverse of pair_w."""
    b, h, wp, c2 = x2.shape
    return x2.reshape(b, h, wp * 2, c2 // 2)
