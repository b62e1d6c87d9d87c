"""Model graph tests: shapes, dtype policy, shape polymorphism, determinism.

All applies are jitted (one whole-graph compile, persisted in the cache)
— eager per-op compilation is prohibitively slow on the 1-core CI host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet


@pytest.fixture(scope="module")
def tiny():
    m = LMNet(**TINY)
    x = jnp.zeros((2, TINY_HW, TINY_HW, 3))
    vs = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.key(0))
    fwd = jax.jit(lambda v, x: m.apply(v, x, train=False))
    return m, vs, fwd


def test_output_shape(tiny):
    m, vs, fwd = tiny
    y = fwd(vs, jnp.zeros((2, TINY_HW, TINY_HW, 3)))
    assert y.shape == (2, TINY_HW, TINY_HW, TINY["num_classes"])
    assert y.dtype == jnp.float32


def test_shape_polymorphism(tiny):
    # same params serve other input sizes (reference hardcodes 256-derived
    # sizes; the rebuild is size-polymorphic — SURVEY §7 hard-part 5)
    m, vs, _ = tiny
    y = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        vs, jnp.zeros((1, 48, 48, 3))
    )
    assert y.shape == (1, 48, 48, TINY["num_classes"])


def test_eval_deterministic(tiny, rng):
    m, vs, fwd = tiny
    x = jnp.asarray(rng.randn(2, TINY_HW, TINY_HW, 3), jnp.float32)
    y1 = fwd(vs, x)
    y2 = fwd(vs, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_train_mode_updates_batch_stats(tiny, rng):
    m, vs, _ = tiny
    x = jnp.asarray(rng.randn(2, TINY_HW, TINY_HW, 3), jnp.float32)
    train_fwd = jax.jit(
        lambda v, x, k: m.apply(
            v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k}
        )
    )
    y, mutated = train_fwd(vs, x, jax.random.key(1))
    old = jax.tree.leaves(vs["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_bf16_compute_policy():
    m = LMNet(**TINY, dtype=jnp.bfloat16)
    x = jnp.zeros((2, TINY_HW, TINY_HW, 3))
    vs = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.key(0))
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(vs["params"]))
    y = jax.jit(lambda v, x: m.apply(v, x, train=False))(vs, x)
    assert y.dtype == jnp.float32


def test_default_param_count_matches_reference_scale():
    # full-size model ~3.97M params (lightweight by design; reference
    # advertises ~4-5M). Guard against silent graph changes. eval_shape
    # traces without compiling or allocating.
    m = LMNet()
    vs = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 256, 256, 3)), train=False),
        jax.random.key(0),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vs["params"]))
    assert 3_800_000 < n < 4_200_000, n
