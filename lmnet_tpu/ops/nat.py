"""Neighborhood attention (NAT) as a pure-XLA op — TPU-native replacement for
the NATTEN CUDA operator used by the reference (``core/modules.py:18,509``;
``NeighborhoodAttention2D(dim, num_heads, kernel_size=3)``).

Semantics (matching NATTEN):
  * every query pixel attends to exactly ``k x k`` keys;
  * the window is *centered* on the query in the interior and *clamped*
    (slid, not zero-padded) at image borders so it stays fully inside;
  * a learned relative positional bias ``rpb`` of shape
    ``(heads, 2k-1, 2k-1)`` is added to the logits, indexed by the relative
    offset between key and query.

TPU-first formulation, twice over:
  1. **No gathers.** For each of the k*k window offsets ``(oh, ow)`` the key
     rows a query selects are ``clip(i - k//2, 0, H-k) + oh`` — a clamped
     identity map of ``i``, which is exactly an *edge-pad* of the slice
     ``K[oh : H-k+1+oh]``.  The whole op is k^2 (slice + edge-pad +
     multiply + reduce) steps that XLA fuses into elementwise VPU work.
  2. **No tiny lane dims.** Logits/attention live as a FLAT
     ``(B, H, W, k^2 * heads)`` tensor (e.g. 108 lanes at 12 heads) —
     a (B,H,W,heads,k^2) layout puts 9 on the 128-wide lane dimension and
     wastes ~14x of every vector register, which dominated the training
     backward in profiles.  Softmax over the k^2 slots runs on offset
     slices of the flat tensor; per-head reductions/broadcasts are tiny
     one-hot matmuls.

This is the correctness reference, the default CPU path, and the training
backward (the fused Pallas forward in ``ops/pallas/nat_kernel.py`` routes
its custom_vjp through this function).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _rpb_index_1d(size: int, kernel_size: int, offset: int) -> tuple[int, ...]:
    """Relative-bias index along one axis for window slot ``offset``.

    For query position i, the key position is clip(i-c, 0, size-k) + offset;
    the relative displacement (key - query) indexes the (2k-1)-wide bias
    table at ``displacement + (k-1)``.
    """
    k, c = kernel_size, kernel_size // 2
    i = np.arange(size)
    key_pos = np.clip(i - c, 0, size - k) + offset
    return tuple((key_pos - i + (k - 1)).tolist())


def _edge_pad_hw(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Edge-pad axes 1 (H) and 2 (W) of an NHW... array by (lo, hi)."""
    pad = [(0, 0), (lo, hi), (lo, hi)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad, mode="edge")


def _window(x: jnp.ndarray, oh: int, ow: int, kk: int) -> jnp.ndarray:
    """Keys/values each query sees at window slot (oh, ow): clamped shift."""
    H, W = x.shape[1], x.shape[2]
    c = kk // 2
    return _edge_pad_hw(
        x[:, oh : H - kk + 1 + oh, ow : W - kk + 1 + ow], c, kk - 1 - c
    )


def neighborhood_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rpb: jnp.ndarray,
    kernel_size: int = 3,
    scale: float | None = None,
) -> jnp.ndarray:
    """NATTEN-semantics neighborhood attention.

    Args:
      q, k, v: (B, H, W, C) with C = heads * head_dim.
      rpb: (heads, 2*kernel_size-1, 2*kernel_size-1) relative position bias.
      kernel_size: neighborhood size (odd).
      scale: logit scale; defaults to head_dim ** -0.5.

    Returns:
      (B, H, W, C) attention output (pre output-projection).
    """
    B, H, W, C = q.shape
    heads = rpb.shape[0]
    assert C % heads == 0, f"C={C} not divisible by heads={heads}"
    hd = C // heads
    kk = kernel_size
    assert H >= kk and W >= kk, "feature map smaller than NAT kernel"
    if scale is None:
        scale = hd**-0.5

    qs = q * jnp.asarray(scale, q.dtype)
    offsets = [(oh, ow) for oh in range(kk) for ow in range(kk)]

    # one-hot head-segment matrix: sum over head_dim / broadcast to channels
    seg = jnp.asarray(
        np.kron(np.eye(heads, dtype=np.float32), np.ones((hd, 1), np.float32))
    ).astype(q.dtype)  # (C, heads)

    # flat logits (B, H, W, kk*kk*heads), offset-major
    logit_slices = []
    for oh, ow in offsets:
        prod = qs * _window(k, oh, ow, kk)  # (B, H, W, C)
        l = prod if hd == 1 else prod @ seg  # (B, H, W, heads)
        ih = np.asarray(_rpb_index_1d(H, kk, oh))
        iw = np.asarray(_rpb_index_1d(W, kk, ow))
        bias = jnp.transpose(rpb[:, ih, :][:, :, iw], (1, 2, 0))  # (H, W, heads)
        logit_slices.append(l + bias.astype(l.dtype)[None])
    logits = jnp.concatenate(logit_slices, axis=-1)  # (B,H,W,kk*kk*heads)

    # softmax over the kk*kk offset slots, computed on the flat layout
    n = len(offsets)
    m = logits[..., :heads]
    for o in range(1, n):
        m = jnp.maximum(m, logits[..., o * heads : (o + 1) * heads])
    e = jnp.exp(logits - jnp.tile(m, (1, 1, 1, n)))
    ssum = e[..., :heads]
    for o in range(1, n):
        ssum = ssum + e[..., o * heads : (o + 1) * heads]
    attn = e / jnp.tile(ssum, (1, 1, 1, n))

    out = jnp.zeros_like(q)
    for idx, (oh, ow) in enumerate(offsets):
        a = attn[..., idx * heads : (idx + 1) * heads]  # (B, H, W, heads)
        w_bc = a if hd == 1 else a @ seg.T  # (B, H, W, C)
        out = out + w_bc * _window(v, oh, ow, kk)
    return out
