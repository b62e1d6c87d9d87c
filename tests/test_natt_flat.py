"""Fused flat NATT-block kernel vs the unfused serve path (interpret mode).

The kernel is a documented NEGATIVE RESULT (correct but measured 2x slower
than the unfused interior on v5e — see ops/pallas/natt_flat.py); these
tests pin its numerics so the record stays trustworthy."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


import jax
import jax.numpy as jnp

from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet, structural_reparam
from lmnet_tpu.ops.pallas.natt_flat import fold_natt_weights, natt_flat_interior
from lmnet_tpu.serve import engine as se


def _natt_interior_ref(p, emb, num_heads):
    """The unfused serve-path interior (everything after the embed conv)."""
    from lmnet_tpu.ops.nat import neighborhood_attention

    ln1 = se._ln(p["norm1"], emb)
    qkv = se._dense(p["attn"]["qkv"], ln1)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nat = neighborhood_attention(q, k, v, p["attn"]["rpb"], 3)
    att = se._dense(p["attn"]["proj"], nat) + emb
    return se._mlp(p["mlp"], se._ln(p["norm2"], att)) + att


@pytest.fixture(scope="module")
def natt_params():
    model = LMNet(**TINY)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, TINY_HW, TINY_HW, 3)), train=False
    )
    return structural_reparam(variables)["params"]


@pytest.mark.parametrize("name,ci", [("natt4", 0), ("natt3", 1)])
def test_natt_flat_interior_matches_unfused(rng, natt_params, name, ci):
    """Fused kernel == unfused path at the two high-res stage configs.
    TINY filters (4,8,12,16,24), heads=2: natt4 C=4 (hd=2), natt3 C=8
    (hd=4) — border rows/cols, LN, qkv/proj/fc ladders all exercised."""
    p = natt_params[name]
    C = p["attn"]["qkv"]["dense"]["kernel"].shape[0]
    heads = 2
    H = W = 16
    emb = jnp.asarray(rng.randn(2, H, W, C) * 0.5, jnp.float32)

    want = _natt_interior_ref(p, emb, heads)
    fw = fold_natt_weights(p, C, W, heads)
    got = natt_flat_interior(
        emb.reshape(2, H, W * C), fw, heads, C, W, interpret=True
    ).reshape(2, H, W, C)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_natt_flat_single_stripe(rng, natt_params):
    """H == 8: one stripe, top and bottom fixups in the same block."""
    p = natt_params["natt4"]
    C = p["attn"]["qkv"]["dense"]["kernel"].shape[0]
    H, W, heads = 8, 8, 2
    emb = jnp.asarray(rng.randn(1, H, W, C) * 0.5, jnp.float32)
    want = _natt_interior_ref(p, emb, heads)
    fw = fold_natt_weights(p, C, W, heads)
    got = natt_flat_interior(
        emb.reshape(1, H, W * C), fw, heads, C, W, interpret=True
    ).reshape(1, H, W, C)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
