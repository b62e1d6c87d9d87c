"""Resampling ops with exact PyTorch numerics, formulated as matmuls for the MXU.

The reference decoder upsamples with ``nn.Upsample(mode='bilinear',
align_corners=True)`` (reference ``core/LM_Net.py:58-74``) and the bottleneck
pools with ``adaptive_avg_pool2d`` (reference ``core/modules.py:495-498``).
Both are *separable* linear maps over rows and columns, so instead of gathers
(slow on TPU) we build 1-D interpolation/pooling matrices once per shape and
apply them as two dense matmuls -- this runs on the MXU and fuses cleanly
under XLA.

All ops take NHWC (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-interpolation matrix matching torch bilinear.

    Source coordinate per torch's upsampling kernels:
      align_corners=True : src = i * (in-1) / (out-1)
      align_corners=False: src = (i + 0.5) * in/out - 0.5   (clamped to >= 0)
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        # torch maps the single output to src 0 when align_corners else center.
        if align_corners or in_size == 1:
            m[0, 0] = 1.0
            return m.astype(np.float32)
        src = np.array([0.5 * in_size - 0.5])
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.maximum(src, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching torch adaptive_avg_pool.

    torch regions: start = floor(i*in/out), end = ceil((i+1)*in/out).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply row matrix mh (H'->H) and col matrix mw (W'->W) to NHWC x.

    HIGHEST precision: interpolation weights must not round to bf16 on the
    MXU (torch-parity), and these matmuls are tiny next to the conv stack.
    """
    import jax

    mh = jnp.asarray(mh, dtype=x.dtype)
    mw = jnp.asarray(mw, dtype=x.dtype)
    p = jax.lax.Precision.HIGHEST
    # (B,H,W,C) -> (B,H',W,C) -> (B,H',W',C)
    x = jnp.einsum("bhwc,oh->bowc", x, mh, optimize=True, precision=p)
    x = jnp.einsum("bhwc,ow->bhoc", x, mw, optimize=True, precision=p)
    return x


def bilinear_resize(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to ``out_hw`` with torch numerics.

    Matches ``F.interpolate(x, size=out_hw, mode='bilinear',
    align_corners=...)`` bit-for-bit up to float association order.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(
        x,
        _bilinear_matrix(h, oh, align_corners),
        _bilinear_matrix(w, ow, align_corners),
    )


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """`nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`."""
    _, h, w, _ = x.shape
    return bilinear_resize(x, (2 * h, 2 * w), align_corners=True)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """`F.adaptive_avg_pool2d` on NHWC ``x`` (exact torch region semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(
        x, _adaptive_pool_matrix(h, oh), _adaptive_pool_matrix(w, ow)
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """`AdaptiveAvgPool2d(1)` (used by SE, reference core/modules.py:1023)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
