"""Dense 2D BEV backbone (base_bev_backbone.py:6-112), NHWC.

Multi-level stride blocks of Conv+BN+ReLU with transpose-conv upsampling and
channel concat. The reference's ZeroPad2d(1)+Conv(stride) head conv is plain
padding=1 convolution here (identical arithmetic).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import ConvBNReLU, PairedConvBNReLU, pair_w, unpair_w


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int
    use_running_average: bool = False
    axis_name: str | None = None
    dtype: object = None

    @property
    def num_bev_features(self):
        cfg = self.model_cfg
        if cfg.get('UPSAMPLE_STRIDES'):
            n = sum(cfg['NUM_UPSAMPLE_FILTERS'])
        else:
            n = cfg['NUM_FILTERS'][-1]
        return n

    @nn.compact
    def __call__(self, batch, training=False):
        cfg = self.model_cfg
        layer_nums = list(cfg.get('LAYER_NUMS', []))
        layer_strides = list(cfg.get('LAYER_STRIDES', []))
        num_filters = list(cfg.get('NUM_FILTERS', []))
        upsample_strides = list(cfg.get('UPSAMPLE_STRIDES', []))
        num_upsample = list(cfg.get('NUM_UPSAMPLE_FILTERS', []))

        ra = not training
        x = batch['spatial_features']  # (B, H, W, C)
        in_h = x.shape[1]
        ups = []
        out = dict(batch)
        paired = False  # x currently in width-paired (B, H, W/2, 2C) layout
        for i, (n_layers, stride, nf) in enumerate(zip(layer_nums, layer_strides, num_filters)):
            # <=64-channel 3x3 convs fill half the MXU output lanes; run
            # those blocks in the width-paired layout (see PairedConvBNReLU)
            cw = x.shape[2] * (2 if paired else 1)
            pairable = (stride in (1, 2) and nf <= 64
                        and x.shape[-1] <= (128 if paired else 64)
                        and cw % (2 * stride) == 0)
            if pairable and not paired:
                x = pair_w(x)
                paired = True
            if paired and not pairable:
                if (stride == 2 and nf >= 128
                        and x.shape[2] % 1 == 0):  # paired-in upstride conv
                    x = PairedConvBNReLU(
                        nf, 2, unpaired_out=True, use_running_average=ra,
                        axis_name=self.axis_name, dtype=self.dtype)(x)
                    paired = False
                    stride_done = True
                else:
                    x = unpair_w(x)
                    paired = False
                    stride_done = False
            else:
                stride_done = False
            conv = (lambda f, s: PairedConvBNReLU(
                        f, s, use_running_average=ra,
                        axis_name=self.axis_name, dtype=self.dtype)) \
                if paired else \
                   (lambda f, s: ConvBNReLU(
                        f, 3, s, padding=1, use_running_average=ra,
                        axis_name=self.axis_name, dtype=self.dtype))
            if not stride_done:
                x = conv(nf, stride)(x)
            for _ in range(n_layers):
                x = conv(nf, 1)(x)
            xu = unpair_w(x) if paired else x
            total_stride = int(in_h / xu.shape[1])
            out[f'spatial_features_{total_stride}x'] = xu
            if upsample_strides:
                us = upsample_strides[i]
                if us >= 1:
                    # the 1x1/k==s deblocks consume the paired layout
                    # directly when us == 1 (a 1x1 conv on paired input is
                    # the same matmul with block-diagonal weights — but
                    # cheaper to just unpair: XLA folds the relayout into
                    # the matmul operand load)
                    u = ConvBNReLU(num_upsample[i], int(us), int(us),
                                   use_running_average=ra, axis_name=self.axis_name,
                                   transpose=True, dtype=self.dtype)(xu)
                else:
                    ds = int(np.round(1 / us))
                    u = ConvBNReLU(num_upsample[i], ds, ds, padding=0,
                                   use_running_average=ra, axis_name=self.axis_name,
                                   dtype=self.dtype)(xu)
                ups.append(u)
            else:
                ups.append(xu)
        if paired:
            x = unpair_w(x)
            paired = False

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]
        # len(ups) == 0: passthrough (SingleHead's empty mini-backbone)
        if len(upsample_strides) > len(layer_nums):
            us = int(upsample_strides[-1])
            x = ConvBNReLU(x.shape[-1], us, us, use_running_average=ra,
                           axis_name=self.axis_name, transpose=True,
                           dtype=self.dtype)(x)
        out['spatial_features_2d'] = x
        return out
