"""Train-vs-deploy equivalence of the structural re-parameterization
(reference core/modules.py:602-657 fusion math; SURVEY §3.4)."""

import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np

from lmnet_tpu.models.blocks import ReparamConv
from lmnet_tpu.models.lm_net import LMNet, structural_reparam


def _randomize_bn_stats(variables, rng):
    """Give BN running stats non-trivial values so fusion is actually tested."""
    import flax

    variables = flax.core.unfreeze(variables)

    def rand_like(x):
        return jnp.asarray(rng.uniform(0.5, 2.0, x.shape), jnp.float32)

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = rand_like(v) if k == "var" else jnp.asarray(
                    rng.normal(0, 0.5, v.shape), jnp.float32
                )
        return out

    variables["batch_stats"] = walk(variables["batch_stats"])
    return variables


def test_single_block_fusion_exact(rng):
    m = ReparamConv(expand_channels=8, out_channels=4)
    x = jnp.asarray(rng.randn(2, 9, 9, 3), jnp.float32)
    vs = jax.jit(lambda k: m.init(k, x))(jax.random.key(0))
    vs = _randomize_bn_stats(vs, rng)
    y_train_graph = jax.jit(lambda v, x: m.apply(v, x, train=False))(vs, x)

    dv = structural_reparam(vs)
    md = ReparamConv(expand_channels=8, out_channels=4, deploy=True)
    y_deploy = jax.jit(lambda v, x: md.apply(v, x, train=False))(dv, x)
    np.testing.assert_allclose(
        np.asarray(y_train_graph), np.asarray(y_deploy), rtol=1e-4, atol=1e-5
    )


def test_full_model_fusion(rng):
    from conftest import TINY, TINY_HW

    m = LMNet(**TINY)
    x = jnp.asarray(rng.randn(2, TINY_HW, TINY_HW, 3), jnp.float32)
    vs = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.key(0))
    vs = _randomize_bn_stats(vs, rng)
    y = jax.jit(lambda v, x: m.apply(v, x, train=False))(vs, x)

    dv = structural_reparam(vs)
    md = LMNet(**TINY, deploy=True)
    yd = jax.jit(lambda v, x: md.apply(v, x, train=False))(dv, x)
    # exactness is covered per-block above; across 16 stacked blocks with
    # randomized BN stats, fp32 accumulation through the nonlinearities
    # amplifies — check the wiring at 2% of the logit scale.
    scale = float(np.abs(np.asarray(y)).max())
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(yd), rtol=0.0, atol=0.02 * scale
    )

    # deploy params are strictly smaller (branches collapsed)
    n_train = sum(p.size for p in jax.tree.leaves(vs["params"]))
    n_deploy = sum(p.size for p in jax.tree.leaves(dv["params"]))
    assert n_deploy < n_train
