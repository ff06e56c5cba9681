"""Anchor/point box coders (pcdet/utils/box_coder_utils.py), functional JAX.

Unlike the reference classes these are stateless dataclasses with pure
encode/decode — no in-place clamping of caller arrays (the reference mutates
its inputs at box_coder_utils.py:22-23; we clamp on local copies).
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResidualCoder:
    """7(+1 with sincos)-dim anchor residual coder (box_coder_utils.py:5-77)."""

    code_size: int = 7
    encode_angle_by_sincos: bool = False

    @property
    def full_code_size(self):
        return self.code_size + (1 if self.encode_angle_by_sincos else 0)

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7 + C) -> (..., code_size)."""
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], 1e-5, None))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5, None))

        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings (..., code_size), anchors (..., 7 + C) -> (..., 7 + C)."""
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if not self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, rt = [box_encodings[..., i] for i in range(7)]
            extra_start = 7
        else:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = [box_encodings[..., i] for i in range(8)]
            extra_start = 8

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        # zip-truncate extras like the reference (box_coder_utils.py:76)
        n_extra = min(anchors.shape[-1] - 7, box_encodings.shape[-1] - extra_start)
        extras = [
            box_encodings[..., extra_start + i] + anchors[..., 7 + i]
            for i in range(n_extra)
        ]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclasses.dataclass(frozen=True)
class PreviousResidualDecoder:
    """Legacy decoder, size order (w,l,h) swapped (box_coder_utils.py:80-109)."""

    code_size: int = 7

    @property
    def full_code_size(self):
        return self.code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        rg = rt + ra
        extras = [box_encodings[..., 7 + i] + anchors[..., 7 + i]
                  for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclasses.dataclass(frozen=True)
class PreviousResidualRoIDecoder:
    """Legacy RoI decoder: rg = ra - rt (box_coder_utils.py:112-141)."""

    code_size: int = 7

    @property
    def full_code_size(self):
        return self.code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        rg = ra - rt
        extras = [box_encodings[..., 7 + i] + anchors[..., 7 + i]
                  for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclasses.dataclass(frozen=True)
class PointResidualCoder:
    """Point-anchored 8-dim coder with class mean sizes (box_coder_utils.py:144-222)."""

    code_size: int = 8
    use_mean_size: bool = True
    mean_size: tuple = ()  # ((dx, dy, dz) per class), 1-indexed classes

    @property
    def full_code_size(self):
        return self.code_size

    def _sizes_for(self, classes):
        mean = jnp.asarray(self.mean_size, dtype=jnp.float32)  # (num_cls, 3)
        idx = jnp.clip(classes - 1, 0, mean.shape[0] - 1)
        return mean[idx]  # (..., 3)

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+C), points (N, 3), gt_classes (N,) in [1, num_cls]."""
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5, None))
        xg, yg, zg, dxg, dyg, dzg, rg = [gt_boxes[..., i] for i in range(7)]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            sizes = self._sizes_for(gt_classes)
            dxa, dya, dza = sizes[..., 0], sizes[..., 1], sizes[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        extras = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *extras], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = [box_encodings[..., i] for i in range(8)]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            sizes = self._sizes_for(pred_classes)
            dxa, dya, dza = sizes[..., 0], sizes[..., 1], sizes[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        extras = [box_encodings[..., 8 + i] for i in range(box_encodings.shape[-1] - 8)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


def build_box_coder(name, **kwargs):
    registry = {
        'ResidualCoder': ResidualCoder,
        'PreviousResidualDecoder': PreviousResidualDecoder,
        'PreviousResidualRoIDecoder': PreviousResidualRoIDecoder,
        'PointResidualCoder': PointResidualCoder,
    }
    cls = registry[name]
    import inspect

    accepted = {k: v for k, v in kwargs.items() if k in inspect.signature(cls).parameters}
    if name == 'PointResidualCoder' and 'mean_size' in accepted:
        accepted['mean_size'] = tuple(tuple(s) for s in accepted['mean_size'])
    return cls(**accepted)
