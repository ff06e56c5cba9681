"""bf16 gradient flow through the SA packing path.

Regression for the round-3 advisor's high-severity finding: the eval-time
gather packing routed bf16 projections through `lax.bitcast_convert_type`,
whose JVP/VJP is ZERO in JAX — with COMPUTE_DTYPE bfloat16 (every shipping
KITTI config) the pack/unpack round-trip silently killed gradients to every
`pre_proj` Dense and all upstream features feeding SA modules. The fix
keeps bitcast packing for eval only; training packs f32. These tests pin
nonzero bf16-mode gradients so the bug cannot return.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lidardetection_tpu.models.backbones_3d.pointnet2_modules import (
    PointnetSAModuleMSG,
)


def _grad_norms(dtype):
    rng = np.random.RandomState(0)
    B, N, C = 2, 128, 8
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    num = jnp.full((B,), N, jnp.int32)

    mod = PointnetSAModuleMSG(
        npoint=32, radii=(0.5, 1.0), nsamples=(8, 16),
        mlps=((C, 16), (C, 16)), dtype=dtype)
    variables = mod.init(
        {'params': jax.random.PRNGKey(0)}, xyz, feats, num, True)

    def loss(params, feats):
        (_, out, _), _ = mod.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            xyz, feats, num, True, mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_params, g_feats = jax.grad(loss, argnums=(0, 1))(
        variables['params'], feats)
    flat = jax.tree_util.tree_leaves_with_path(g_params)
    norms = {jax.tree_util.keystr(path): float(
        jnp.linalg.norm(leaf.astype(jnp.float32)))
        for path, leaf in flat}
    return norms, float(jnp.linalg.norm(g_feats.astype(jnp.float32)))


def test_bf16_training_gradients_flow_to_pre_proj():
    norms, g_feats = _grad_norms(jnp.bfloat16)
    pre = {k: v for k, v in norms.items() if 'pre_proj' in k}
    assert pre, norms.keys()
    for k, v in pre.items():
        assert v > 0.0, (k, norms)
    assert g_feats > 0.0


def test_bf16_gradients_match_f32_direction():
    """bf16 grads should be within coarse agreement of f32 grads (not 0)."""
    n16, f16 = _grad_norms(jnp.bfloat16)
    n32, f32_ = _grad_norms(None)
    for k, v32 in n32.items():
        if 'pre_proj' not in k:
            continue
        v16 = n16[k]
        assert v16 > 0.2 * v32, (k, v16, v32)
    assert f16 > 0.2 * f32_
