"""Serving engine and fused ReparamConv kernel equivalence tests (CPU,
Pallas interpreter mode for the fused kernels)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet, structural_reparam
from lmnet_tpu.models.blocks import ReparamConv
from lmnet_tpu.ops.pallas.rc_kernel import (
    _rc_xla,
    fold_rc_weights,
    fused_reparam_conv,
)
from lmnet_tpu.serve import deploy_forward


def _randomize_bn(vs, rng):
    vs = flax.core.unfreeze(vs)

    def walk(t):
        return {
            k: (
                walk(v)
                if isinstance(v, dict)
                else jnp.asarray(rng.uniform(0.5, 2.0, v.shape), jnp.float32)
                if k == "var"
                else jnp.asarray(rng.normal(0, 0.5, v.shape), jnp.float32)
            )
            for k, v in t.items()
        }

    vs["batch_stats"] = walk(vs["batch_stats"])
    return vs


@pytest.fixture(scope="module")
def deploy_vars(rng=np.random.RandomState(0)):
    m = LMNet(**TINY)
    x = jnp.zeros((2, TINY_HW, TINY_HW, 3))
    vs = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.key(0))
    return structural_reparam(_randomize_bn(vs, rng))


def test_fused_rc_kernel_matches_block(rng):
    m = ReparamConv(expand_channels=8, out_channels=6)
    x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    vs = _randomize_bn(m.init(jax.random.key(0), x), rng)
    dv = structural_reparam(vs)
    md = ReparamConv(expand_channels=8, out_channels=6, deploy=True)
    ref = md.apply(dv, x, train=False)
    w = fold_rc_weights(dv["params"], dv["batch_stats"])
    out = fused_reparam_conv(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # XLA fallback path agrees too
    out2 = _rc_xla(x, w)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_deploy_forward_matches_model(deploy_vars, rng):
    x = jnp.asarray(rng.randn(2, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="pallas", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_flat_rc_backend(deploy_vars, rng):
    """rc_backend='flat' (rc_flat fused dw+gelu+SE-sums kernel) through the
    full deploy graph matches the Flax deploy model."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="flat", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_xla_backend(deploy_vars, rng):
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_natt_int8(deploy_vars, rng):
    """The opt-in int8 NATT-interior path tracks the bf16 graph to within
    quantization noise (static-scale int8 is ~1-2% mean activation error;
    the logit map must stay close, not bit-exact)."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    ref = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    )
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla", natt_int8=True,
    )
    r, o = np.asarray(ref), np.asarray(out)
    rel = np.abs(r - o).mean() / (np.abs(r).mean() + 1e-9)
    assert rel < 0.05, f"int8 interior drift too large: {rel}"
