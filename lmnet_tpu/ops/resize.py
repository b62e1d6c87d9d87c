"""Resampling ops with exact PyTorch numerics, TPU-efficient.

The reference decoder upsamples with ``nn.Upsample(mode='bilinear',
align_corners=True)`` (reference ``core/LM_Net.py:58-74``) and the bottleneck
pools with ``adaptive_avg_pool2d`` (reference ``core/modules.py:495-498``).

Implementations (all NHWC, all bit-matching torch's source-coordinate
formulas):
  * bilinear resize = separable 2-tap lerp per axis: gather the two
    contributing rows/cols (compile-time constant indices) and blend with
    per-position weights.  O(N) traffic and FLOPs — a dense interpolation-
    matrix matmul formulation measured 25 ms for one 128->256 upsample on
    v5e; this path is <1 ms.
  * adaptive average pooling = ``lax.reduce_window`` mean when the input is
    divisible by the output (every LM-Net case), falling back to an exact
    region-matrix matmul otherwise (torch's floor/ceil region semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# 2x-upsample formulation: 'einsum' (default) or 'flat' (the Pallas
# flat-layout kernel, ops/pallas/upsample_flat.py).  Read at import time —
# perf A/B harnesses launch a fresh process per config (cf. xla_flag_sweep).
_UPSAMPLE2X_BACKEND = os.environ.get("LMNET_UPSAMPLE_BACKEND", "einsum")


@functools.lru_cache(maxsize=None)
def _lerp_coeffs(in_size: int, out_size: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) arrays for 1-D bilinear, torch semantics.

    align_corners=True : src = i * (in-1) / (out-1)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to >= 0
    """
    if out_size == 1:
        if align_corners or in_size == 1:
            src = np.array([0.0])
        else:
            src = np.array([0.5 * in_size - 0.5])
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.maximum(src, 0.0)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


@functools.lru_cache(maxsize=None)
def _lerp_matrix(in_size: int, out_size: int, align: bool) -> np.ndarray:
    """(out, in) 2-tap interpolation matrix (same numerics as the lerp)."""
    lo, hi, frac = _lerp_coeffs(in_size, out_size, align)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(m, (np.arange(out_size), hi), frac)
    return m


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int, align: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if x.dtype == jnp.bfloat16 and x.ndim == 4 and axis in (1, 2):
        # serving path: the 2-tap gather lowers to slow TPU gathers on the
        # small channel minor dim (5.5 ms per 128->256x24 upsample at B=64);
        # a sparse interpolation-matrix matmul runs on the MXU (3.2 ms, and
        # identical 2-tap numerics at bf16 resolution)
        m = jnp.asarray(_lerp_matrix(in_size, out_size, align), x.dtype)
        eq = "oh,bhwc->bowc" if axis == 1 else "ow,bhwc->bhoc"
        return jnp.einsum(eq, m, x)
    lo, hi, frac = _lerp_coeffs(in_size, out_size, align)
    xl = jnp.take(x, jnp.asarray(lo), axis=axis)
    xh = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(frac, dtype=x.dtype).reshape(shape)
    return xl * (1 - w) + xh * w


def bilinear_resize(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to ``out_hw``, matching
    ``F.interpolate(mode='bilinear', align_corners=...)``."""
    oh, ow = out_hw
    x = _resize_axis(x, 1, oh, align_corners)
    x = _resize_axis(x, 2, ow, align_corners)
    return x


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """`nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`.

    Formulation experiments (both e2e-neutral, see BASELINE.md ledger):
    a phase-interleave variant (``upsample2x_phase``) was 16% SLOWER e2e,
    and an explicit (B,C,H,W)-"sandwich" matmul variant won ~2x on the
    ISOLATED fwd+bwd micro-bench (perf/upsample_ab.py) but moved e2e by
    exactly nothing (187.3 -> 187.3 train img/s) — XLA's full-graph layout
    assignment already avoids the copies the micro-bench pays in
    isolation. The per-axis einsum stays as the simplest equal-speed form.
    """
    if _UPSAMPLE2X_BACKEND == "flat":
        from lmnet_tpu.ops.pallas.upsample_flat import upsample2x_flat

        return upsample2x_flat(x)
    _, h, w, _ = x.shape
    return bilinear_resize(x, (2 * h, 2 * w), align_corners=True)


def upsample2x_phase(x: jnp.ndarray) -> jnp.ndarray:
    """Transpose-free 2x align_corners=True upsample via phase blends.

    MEASURED NEGATIVE RESULT — kept unwired (see BASELINE.md ledger):
    e2e serving 1347 -> 1128 img/s and train 187 -> 181 img/s at 256^2
    B=128 when this replaced the einsum formulation.  The idea: for
    exactly-2x align_corners=True the tap OFFSETS are uniform per output
    phase even though every position's weight differs:
      even col 2k: src = k - k/(2W-1)        -> blend of x[k-1], x[k]
      odd  col 2k+1: src = k + (W-1-k)/(2W-1) -> blend of x[k], x[k+1]
    so each axis is two shifted elementwise blends + a phase interleave,
    with no W-contraction einsum and hence none of the (B,H,C,W) layout
    copies the matmul formulation drags into fwd AND bwd (~2.5 ms each).
    But the stack+reshape phase INTERLEAVE is itself a relayout on the
    second-minor dim, and it costs more than the transposes it removes.
    """
    b, h, w, c = x.shape
    if h < 2 or w < 2:
        return bilinear_resize(x, (2 * h, 2 * w), align_corners=True)
    dt = x.dtype

    # --- W axis -----------------------------------------------------------
    k = np.arange(w, dtype=np.float64)
    aw = jnp.asarray(k / (2 * w - 1), dt).reshape(1, 1, w, 1)  # weight on x[k-1]
    bw = jnp.asarray((w - 1 - k) / (2 * w - 1), dt).reshape(1, 1, w, 1)  # on x[k+1]
    xm1 = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    xp1 = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    even = x * (1 - aw) + xm1 * aw
    odd = x * (1 - bw) + xp1 * bw
    x = jnp.stack([even, odd], axis=3).reshape(b, h, 2 * w, c)

    # --- H axis -----------------------------------------------------------
    k = np.arange(h, dtype=np.float64)
    ah = jnp.asarray(k / (2 * h - 1), dt).reshape(1, h, 1, 1)
    bh = jnp.asarray((h - 1 - k) / (2 * h - 1), dt).reshape(1, h, 1, 1)
    xm1 = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    xp1 = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    even = x * (1 - ah) + xm1 * ah
    odd = x * (1 - bh) + xp1 * bh
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * h, 2 * w, c)


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching torch adaptive_avg_pool:
    start = floor(i*in/out), end = ceil((i+1)*in/out)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m.astype(np.float32)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """`F.adaptive_avg_pool2d` on NHWC ``x`` (exact torch region semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        if x.dtype == jnp.bfloat16:
            # bf16 path (serving AND --apm training): a strided depthwise
            # ones-kernel conv — the reshape-mean's rank-6 view forces
            # layout copies around the pyramid pool (measured +36 img/s
            # e2e at B=128). The kernel is exactly-representable ones (the
            # MXU accumulates the window sum in fp32 internally either
            # way) and the 1/(kh*kw) scale is applied in fp32, so a
            # non-power-of-two ratio's constant (e.g. 1/9, off ~0.2% in
            # bf16) never rounds into the result. The conv itself stays
            # bf16-in/bf16-out: a preferred_element_type=f32 output breaks
            # the conv transpose rule under autodiff (f32 cotangent vs
            # bf16 kernel) and this op sits in the differentiated train
            # graph via the pyramid pool.
            k = jnp.ones((kh, kw, 1, c), x.dtype)
            out = jax.lax.conv_general_dilated(
                x, k, (kh, kw), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
            return (out.astype(jnp.float32) * (1.0 / (kh * kw))).astype(x.dtype)
        # f32/training path: reshape-mean (not reduce_window: its transpose
        # rule fails to linearize under SPMD-sharded autodiff as of jax 0.9)
        return jnp.mean(
            x.reshape(b, oh, kh, ow, kw, c), axis=(2, 4)
        )
    # non-divisible: exact region-matrix path (rare; small sizes)
    p = jax.lax.Precision.HIGHEST
    mh = jnp.asarray(_adaptive_pool_matrix(h, oh), x.dtype)
    mw = jnp.asarray(_adaptive_pool_matrix(w, ow), x.dtype)
    x = jnp.einsum("bhwc,oh->bowc", x, mh, optimize=True, precision=p)
    return jnp.einsum("bhwc,ow->bhoc", x, mw, optimize=True, precision=p)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """`AdaptiveAvgPool2d(1)` (used by SE, reference core/modules.py:1023)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
