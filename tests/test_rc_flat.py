"""Flat-layout fused ReparamConv deploy block vs the train-mode Flax graph
(transplanted fused weights, interpret mode)."""

import numpy as np

import flax
import jax
import jax.numpy as jnp

from lmnet_tpu.models import blocks
from lmnet_tpu.models.lm_net import structural_reparam
from lmnet_tpu.ops.pallas.rc_flat import (
    dw_gelu_flat,
    _flat_weights,
    fold_rc_flat_weights,
    fused_rc_block,
)


def _rc_variables(rng, cin, ec, cout, hw):
    m = blocks.ReparamConv(expand_channels=ec, out_channels=cout)
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], cin), jnp.float32)
    vs = flax.core.unfreeze(m.init(jax.random.key(0), x))
    for name in ("expand_bn", "large_bn", "square_bn", "ver_bn", "hor_bn"):
        st = vs["batch_stats"][name]
        st["mean"] = jnp.asarray(rng.normal(0, 0.3, st["mean"].shape), jnp.float32)
        st["var"] = jnp.asarray(rng.uniform(0.5, 1.5, st["var"].shape), jnp.float32)
    return m, vs, x


def test_fused_rc_block_matches_train_graph(rng):
    m, vs, x = _rc_variables(rng, cin=3, ec=8, cout=4, hw=(16, 12))
    ref = np.asarray(m.apply(vs, x, train=False))
    dv = structural_reparam(vs)
    fw = fold_rc_flat_weights(dv["params"], dv["batch_stats"], x.shape[2])
    ours = np.asarray(fused_rc_block(x, fw, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_dw_gelu_flat_matches_xla_conv(rng):
    B, H, W, C = 2, 16, 12, 8
    e = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    kd = jnp.asarray(rng.randn(5, 5, 1, C) * 0.2, jnp.float32)
    bd = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        e, kd, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    ) + bd
    ref = jax.nn.gelu(ref, approximate=True)
    t, sums = dw_gelu_flat(
        e.reshape(B, H, W * C), _flat_weights(kd, W), jnp.tile(bd, W), C,
        interpret=True,
    )
    t = np.asarray(t).reshape(B, H, W, C)
    np.testing.assert_allclose(t, np.asarray(ref), rtol=1e-4, atol=1e-5)
    # channel sums fold: (B, W, C).sum(W) == t.sum over H, W
    got = np.asarray(sums).reshape(B, W, C).sum(1)
    np.testing.assert_allclose(got, t.sum((1, 2)), rtol=1e-4, atol=1e-4)
