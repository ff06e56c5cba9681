"""Dense 2D BEV backbone (base_bev_backbone.py:6-112), NHWC.

Multi-level stride blocks of Conv+BN+ReLU with transpose-conv upsampling and
channel concat. The reference's ZeroPad2d(1)+Conv(stride) head conv is plain
padding=1 convolution here (identical arithmetic).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import ConvBNReLU


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
        # NOTE perf: a width-paired (B,H,W/2,2C) layout for the 64-channel
        # convs (fills all 128 MXU output lanes) and 1x1+depth-to-space
        # deblocks both won their microbenches but LOST end-to-end on the
        # chip (backbone 5.68 ms plain vs 6.35 with d2s deblocks vs 6.78
        # paired, batch-8 eval, 2026-08-18) — the relayouts break XLA's
        # conv fusions. Keep the plain formulation.
        for i, (n_layers, stride, nf) in enumerate(zip(layer_nums, layer_strides, num_filters)):
            conv = (lambda f, s: ConvBNReLU(
                f, 3, s, padding=1, use_running_average=ra,
                axis_name=self.axis_name, dtype=self.dtype))
            x = conv(nf, stride)(x)
            for _ in range(n_layers):
                x = conv(nf, 1)(x)
            total_stride = int(in_h / x.shape[1])
            out[f'spatial_features_{total_stride}x'] = x
            if upsample_strides:
                us = upsample_strides[i]
                if us >= 1:
                    u = ConvBNReLU(num_upsample[i], int(us), int(us),
                                   use_running_average=ra, axis_name=self.axis_name,
                                   transpose=True, dtype=self.dtype)(x)
                else:
                    ds = int(np.round(1 / us))
                    u = ConvBNReLU(num_upsample[i], ds, ds, padding=0,
                                   use_running_average=ra, axis_name=self.axis_name,
                                   dtype=self.dtype)(x)
                ups.append(u)
            else:
                ups.append(x)

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
