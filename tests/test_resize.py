"""Golden-value tests: resize/pool ops vs torch (CPU) oracles.

The decoder depends on exact `align_corners=True` bilinear semantics
(reference core/LM_Net.py:58-74) and the bottleneck on torch adaptive
average pooling (core/modules.py:495-498).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lmnet_tpu.ops.resize import adaptive_avg_pool, bilinear_resize, global_avg_pool


def _torch_resize(x_nhwc, size, align):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.interpolate(t, size=size, mode="bilinear", align_corners=align)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 8), (16, 16)), ((16, 12), (8, 6)), ((7, 9), (13, 5)), ((4, 4), (9, 9))],
)
def test_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(bilinear_resize(x, out_hw, align_corners=align))
    ref = _torch_resize(x, out_hw, align)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 16), (4, 4)), ((15, 9), (4, 3)), ((8, 8), (8, 8)), ((10, 10), (3, 7))],
)
def test_adaptive_avg_pool_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(x, out_hw))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = np.transpose(F.adaptive_avg_pool2d(t, out_hw).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_adaptive_avg_pool_bf16_nonpow2_ratio(rng):
    """bf16 conv-pool branch: the 1/(kh*kw) scale must be applied in f32
    so non-power-of-two ratios (e.g. 1/9) round only once at the output
    cast, matching the f32 reshape-mean path to bf16 resolution."""
    import jax.numpy as jnp

    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    want = np.asarray(adaptive_avg_pool(jnp.asarray(x), (3, 3)))
    got = np.asarray(adaptive_avg_pool(xb, (3, 3))).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
    # the rounding itself: vs f32 pooling of the SAME bf16-quantized input.
    # The conv output double-rounds (bf16 sum, then f32-scale + bf16 cast),
    # so allow 1 bf16 ulp of noise — the point is the 1/9 constant's ~0.2%
    # bias must NOT appear as a systematic offset.
    want_q = np.asarray(
        adaptive_avg_pool(xb.astype(jnp.float32), (3, 3))
    )
    ref_cast = np.asarray(jnp.asarray(want_q, jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(got, ref_cast, rtol=9e-3, atol=1e-3)
    # double-rounding ulp noise is direction-random; a bf16-rounded 1/9
    # constant would bias EVERY element ~0.2% the same way — check the
    # SIGNED mean stays near zero
    rel = (got - ref_cast) / np.maximum(np.abs(ref_cast), 1e-3)
    assert abs(np.mean(rel)) < 1e-3


def test_global_avg_pool(rng):
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    ours = np.asarray(global_avg_pool(x))
    assert ours.shape == (2, 1, 1, 4)
    np.testing.assert_allclose(ours[:, 0, 0], x.mean(axis=(1, 2)), rtol=1e-6)


@pytest.mark.parametrize("hw", [(4, 4), (8, 6), (5, 7), (16, 16)])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_upsample2x_phase_matches_torch(rng, hw, dtype):
    """The (unwired, measured-slower — see BASELINE.md ledger) transpose-free
    2-phase 2x upsample == torch bilinear align_corners=True, and its
    gradient is finite/shape-correct."""
    import jax
    import jax.numpy as jnp

    from lmnet_tpu.ops.resize import upsample2x_phase

    x = rng.randn(2, *hw, 3).astype(np.float32)
    ref = _torch_resize(x, (2 * hw[0], 2 * hw[1]), True)
    xj = jnp.asarray(x, getattr(jnp, dtype))
    ours = np.asarray(upsample2x_phase(xj)).astype(np.float32)
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)

    g = jax.grad(lambda v: jnp.sum(upsample2x_phase(v) ** 2))(jnp.asarray(x))
    assert g.shape == x.shape and np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 16, 8), (1, 8, 32, 4), (1, 16, 24, 16), (1, 8, 48, 8)],
)
def test_upsample2x_flat_matches_einsum(rng, shape):
    """The flat-layout Pallas 2x upsample (unwired, measured-slower e2e —
    see BASELINE.md ledger) == the einsum path, fwd AND custom-vjp bwd
    (interpret mode; includes non-pow2 W for the dup-ladder masks)."""
    import jax
    import jax.numpy as jnp

    from lmnet_tpu.ops.pallas.upsample_flat import upsample2x_flat
    from lmnet_tpu.ops.resize import upsample2x_align_corners

    B, H, W, C = shape
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    g = jnp.asarray(rng.randn(B, 2 * H, 2 * W, C), jnp.float32)

    y1 = upsample2x_flat(x, True)
    y2 = upsample2x_align_corners(x)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5
    )
    g1 = jax.vjp(lambda t: upsample2x_flat(t, True), x)[1](g)[0]
    g2 = jax.vjp(upsample2x_align_corners, x)[1](g)[0]
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_upsample2x_flat_fallback_shapes(rng):
    """Unsupported shapes (H%8, lane-misaligned W*C) fall back to the
    einsum path rather than recursing through the env dispatcher."""
    import jax.numpy as jnp

    from lmnet_tpu.ops.pallas.upsample_flat import upsample2x_flat
    from lmnet_tpu.ops.resize import upsample2x_align_corners

    for shape in [(1, 5, 7, 3), (1, 8, 9, 5)]:
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(upsample2x_flat(x, True)),
            np.asarray(upsample2x_align_corners(x)),
            rtol=1e-6,
        )
