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

TPU-first formulation: no gathers.  For each of the k*k window offsets
``(oh, ow)`` the key rows a query selects are
``clip(i - k//2, 0, H-k) + oh`` — a clamped identity map of ``i``, which is
exactly an *edge-pad* of the slice ``K[oh : H-k+1+oh]``.  So the whole op is
k^2 (slice + edge-pad + multiply + reduce) steps that XLA fuses into
elementwise VPU work, plus a softmax over the k^2 logits.  The relative-bias
index vectors are compile-time numpy constants.

This is the correctness reference and the default path; a fused Pallas kernel
(``lmnet_tpu.ops.pallas.nat_kernel``) keeps the whole map in VMEM and avoids
materializing the (B,H,W,heads,k^2) logits in HBM.
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
    the relative displacement (key - query) indexes the (2k-1)-wide bias table
    at ``displacement + (k-1)``.
    """
    k, c = kernel_size, kernel_size // 2
    i = np.arange(size)
    key_pos = np.clip(i - c, 0, size - k) + offset
    return tuple((key_pos - i + (k - 1)).tolist())


def _edge_pad_hw(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Edge-pad axes 1 (H) and 2 (W) of an NHW... array by (lo, hi)."""
    pad = [(0, 0), (lo, hi), (lo, hi)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad, mode="edge")


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
    c = kk // 2
    assert H >= kk and W >= kk, "feature map smaller than NAT kernel"
    if scale is None:
        scale = hd**-0.5

    qh = q.reshape(B, H, W, heads, hd) * jnp.asarray(scale, q.dtype)
    kh_ = k.reshape(B, H, W, heads, hd)
    vh = v.reshape(B, H, W, heads, hd)

    logits = []
    for oh in range(kk):
        for ow in range(kk):
            # keys each query sees at window slot (oh, ow): clamped shift.
            k_sel = _edge_pad_hw(
                kh_[:, oh : H - kk + 1 + oh, ow : W - kk + 1 + ow], c, kk - 1 - c
            )
            s = jnp.einsum("bhwnd,bhwnd->bhwn", qh, k_sel, optimize=True)
            # relative-position bias: outer product of 1-D index maps.
            ih = np.asarray(_rpb_index_1d(H, kk, oh))
            iw = np.asarray(_rpb_index_1d(W, kk, ow))
            bias = rpb[:, ih, :][:, :, iw]  # (heads, H, W)
            s = s + jnp.transpose(bias, (1, 2, 0)).astype(s.dtype)[None]
            logits.append(s)
    logits = jnp.stack(logits, axis=-1)  # (B, H, W, heads, k*k)
    attn = jax.nn.softmax(logits, axis=-1)

    out = jnp.zeros_like(qh)
    idx = 0
    for oh in range(kk):
        for ow in range(kk):
            v_sel = _edge_pad_hw(
                vh[:, oh : H - kk + 1 + oh, ow : W - kk + 1 + ow], c, kk - 1 - c
            )
            out = out + attn[..., idx, None] * v_sel
            idx += 1
    return out.reshape(B, H, W, C)
