"""Flat-layout fused NAT kernel vs the brute-force NATTEN-semantics oracle
(interpret mode — the compiled kernel path is exercised on TPU by bench/serve).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


import jax
import jax.numpy as jnp

from lmnet_tpu.ops.pallas.nat_flat import nat_flat
from tests.test_nat import naive_nat


@pytest.mark.parametrize(
    "hw,heads,hd",
    [
        ((16, 8), 3, 1),   # hd=1: the hottest LM-Net config shape family
        ((16, 8), 2, 4),   # segment-tree head reduction
        ((32, 16), 12, 2),  # the model's real heads count
        ((8, 8), 2, 2),    # single-stripe grid (top+bottom fixups together)
    ],
)
def test_nat_flat_matches_bruteforce(rng, hw, heads, hd):
    H, W = hw
    C = heads * hd
    B = 2
    q = rng.randn(B, H, W, C).astype(np.float32)
    k = rng.randn(B, H, W, C).astype(np.float32)
    v = rng.randn(B, H, W, C).astype(np.float32)
    rpb = (rng.randn(heads, 5, 5) * 0.3).astype(np.float32)
    oracle = naive_nat(q, k, v, rpb, 3)
    out = nat_flat(
        jnp.asarray(q.reshape(B, H, W * C)),
        jnp.asarray(k.reshape(B, H, W * C)),
        jnp.asarray(v.reshape(B, H, W * C)),
        jnp.asarray(rpb), heads, C, W, None, True,
    ).reshape(B, H, W, C)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_nat_flat_grad_matches_xla_reference(rng):
    """custom_vjp backward (XLA formulation) == grad of the XLA reference."""
    from lmnet_tpu.ops.nat import neighborhood_attention

    H, W, heads, hd = 8, 8, 2, 2
    C = heads * hd
    q = jnp.asarray(rng.randn(1, H, W * C), jnp.float32)
    k = jnp.asarray(rng.randn(1, H, W * C), jnp.float32)
    v = jnp.asarray(rng.randn(1, H, W * C), jnp.float32)
    rpb = jnp.asarray(rng.randn(heads, 5, 5) * 0.3, jnp.float32)

    def f_flat(q, k, v, rpb):
        return jnp.sum(nat_flat(q, k, v, rpb, heads, C, W, None, True) ** 2)

    def f_ref(q, k, v, rpb):
        out = neighborhood_attention(
            q.reshape(1, H, W, C), k.reshape(1, H, W, C), v.reshape(1, H, W, C),
            rpb, 3,
        )
        return jnp.sum(out.reshape(1, H, W * C) ** 2)

    g1 = jax.grad(f_flat, argnums=(0, 1, 2, 3))(q, k, v, rpb)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, rpb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "hw,heads,hd",
    [
        ((32, 8), 3, 1),   # multi-stripe (rows=16, nb=2): cross-stripe halo adjoint
        ((16, 8), 2, 4),   # segment-tree reduction in both directions
        ((8, 8), 2, 2),    # single stripe: top+bottom fixups share one stripe
        ((16, 4), 1, 4),   # narrow W: border columns adjacent to each other
    ],
)
def test_nat_flat_bwd_kernel_matches_xla_vjp(rng, hw, heads, hd):
    """Fused Pallas backward (interpret) == vjp of the XLA reference, for
    dq, dk, dv AND drpb (incl. border row/col cases via the halo combine
    and the flat-bias unflatten adjoint)."""
    from lmnet_tpu.ops.pallas.nat_flat import _nat_flat_ref, nat_flat_bwd

    H, W = hw
    C = heads * hd
    B = 2
    scale = float(hd) ** -0.5
    q = jnp.asarray(rng.randn(B, H, W * C), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, W * C), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, W * C), jnp.float32)
    rpb = jnp.asarray(rng.randn(heads, 5, 5) * 0.3, jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W * C), jnp.float32)

    got = nat_flat_bwd(q, k, v, rpb, g, heads, C, W, scale, interpret=True)
    _, vjp = jax.vjp(
        lambda q, k, v, rpb: _nat_flat_ref(q, k, v, rpb, heads, C, W, scale),
        q, k, v, rpb,
    )
    want = vjp(g)
    for name, a, b in zip(("dq", "dk", "dv", "drpb"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_nat_flat_h28_fallback(rng):
    """H not divisible by 8 (e.g. 224^2 inputs -> 28-row NAT stages) must
    fall back to XLA: the Pallas kernels' 8-row halo edge blocks and
    second-minor block-dim rule can't take rows<8 stripes."""
    H, W, heads = 28, 8, 2
    C = 4
    q = rng.randn(1, H, W, C).astype(np.float32)
    rpb = (rng.randn(heads, 5, 5) * 0.3).astype(np.float32)
    oracle = naive_nat(q, q, q, rpb, 3)
    flat = jnp.asarray(q.reshape(1, H, W * C))

    def f(q, k, v, rpb):
        return jnp.sum(nat_flat(q, k, v, rpb, heads, C, W, None, True) ** 2)

    out = nat_flat(flat, flat, flat, jnp.asarray(rpb), heads, C, W, None, True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(1, H, W, C), oracle, rtol=1e-4, atol=1e-5
    )
    # backward also routes through the XLA vjp (no Pallas lowering error)
    grads = jax.grad(f, argnums=(0, 3))(flat, flat, flat, jnp.asarray(rpb))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_nat_flat_small_h_fallback(rng):
    """H < 8 falls back to the XLA formulation (still correct)."""
    H, W, heads = 4, 8, 2
    C = 4
    q = rng.randn(1, H, W, C).astype(np.float32)
    rpb = (rng.randn(heads, 5, 5) * 0.3).astype(np.float32)
    oracle = naive_nat(q, q, q, rpb, 3)
    out = nat_flat(
        jnp.asarray(q.reshape(1, H, W * C)),
        jnp.asarray(q.reshape(1, H, W * C)),
        jnp.asarray(q.reshape(1, H, W * C)),
        jnp.asarray(rpb), heads, C, W, None, True,
    ).reshape(1, H, W, C)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)
