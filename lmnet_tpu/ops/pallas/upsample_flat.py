"""Flat-layout fused 2x bilinear upsample (align_corners=True).

MEASURED NEGATIVE RESULT — kept as a tested opt-in
(LMNET_UPSAMPLE_BACKEND=flat), see BASELINE.md round-4 ledger: e2e
serving 1344.5 -> 1301.1 img/s at 256^2 B=128, and the isolated A/B
(perf/upsample_flat_ab.py) shows why twice over: (a) the einsum
formulation in isolation costs only 0.05-0.8 ms/stage — the xplane's
"up4 = 4 ms" attribution was mostly neighbors fused into the same op,
not the upsample — and (b) this kernel's W-phase dup ladder pays
log2(W)+1 cross-lane rolls on (rows, 2WC) fp32, the same lane-topology
tax the NAT kernel roofline documented (rolls are the bound, not DMA).

``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
(reference ``core/LM_Net.py:58-74``) on the decoder path, working
directly on the network's flat ``(B, H, W*C)`` rows (cf. nat_flat.py):

  * exactly-2x align_corners=True tap OFFSETS are uniform per output phase
    while the WEIGHTS vary per position (src = i*(S-1)/(2S-1)):
        even row 2k   = (1-a_k) x[k] + a_k x[k-1],  a_k = k/(2H-1)
        odd  row 2k+1 = (1-b_k) x[k] + b_k x[k+1],  b_k = (H-1-k)/(2H-1)
    and the same along W with per-lane weight vectors;
  * border clamps are free: a_0 = 0 and b_{H-1} = 0 (likewise along W), so
    the wrapped lane rotations / halo rows never contribute;
  * H halo = 1 row each way, fetched as 8-row edge blocks of a free
    stripe-major view (same scheme as nat_flat);
  * the H-phase interleave is free: the output is written as a
    (B, H, 2, 2*W*C) view of (B, 2H, 2WC) with phases on their own axis;
  * the W-phase pays a real in-register dilation: Mosaic supports no lane
    reshape/gather, so each C-block is duplicated to 2C via a log-depth
    masked-roll ladder (dest block p takes from floor(p/2); roll by each
    set bit of ceil(p/2), destination-indexed masks keep every pull
    consistent), then both phases are +-2C-roll lerps of the dilation.

The backward is the exact adjoint, delegated to the einsum formulation
(transposed lerp matrices) — the kernel targets the serving path where
only the forward runs.

Pinned vs ops.resize.upsample2x_align_corners by tests/test_resize.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upsample_flat_kernel(x_ref, xu_ref, xd_ref, o_ref, *, rows, W, C, H):
    ib = pl.program_id(1)
    WC = W * C

    # halo rows (clamped at the image border; border weights are 0 anyway)
    up = xu_ref[0, 0, 7]  # previous stripe's last row
    dn = xd_ref[0, 0, 0]  # next stripe's first row
    xc = x_ref[0, 0].astype(jnp.float32)  # (rows, WC)
    xm1 = jnp.concatenate([up[None].astype(jnp.float32), xc[:-1]], 0)
    xp1 = jnp.concatenate([xc[1:], dn[None].astype(jnp.float32)], 0)

    # H-phase weights from the global row index
    k = (ib * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)).astype(
        jnp.float32
    )
    ah = k / (2 * H - 1)  # weight on x[k-1] for even output rows
    bh = (H - 1 - k) / (2 * H - 1)  # weight on x[k+1] for odd output rows
    even_h = xc + ah * (xm1 - xc)
    odd_h = xc + bh * (xp1 - xc)

    # W phase: per-lane weights + phase from in-kernel iota (Mosaic
    # rejects captured consts and lane reshapes)
    pblk = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * WC), 1) // C
    jw = (pblk // 2).astype(jnp.float32)
    aw = jw / (2 * W - 1)  # weight on x[j-1] at even output cols
    bw = (W - 1 - jw) / (2 * W - 1)  # weight on x[j+1] at odd cols
    even_w = pblk % 2 == 0
    # dup ladder: dest block p takes from p - ceil(p/2) = floor(p/2), so
    # roll by each set bit of s(p) = ceil(p/2) with DESTINATION-indexed
    # masks.  Sources stay valid (pulls only reach lower blocks whose
    # low bits agree), so after the ladder EVERY block p holds
    # x[floor(p/2)] — the exact 2x block dilation, in log2(W)+1 rolls.
    s = (pblk + 1) // 2
    nbits = max(1, (W).bit_length())

    def dilate2(t):
        # NB rolls must be fp32 (Mosaic rejects 16-bit dynamic_rotate)
        y = jnp.concatenate([t, t], axis=1)  # (rows, 2WC)
        for b in reversed(range(nbits)):
            take = ((s >> b) & 1) == 1
            y = jnp.where(take, pltpu.roll(y, shift=(1 << b) * C, axis=1), y)
        return y

    def w_phase(t):
        d = dilate2(t)
        xm1 = pltpu.roll(d, shift=2 * C, axis=1)  # x[j-1] (wrap: aw[0]=0)
        xp1 = pltpu.roll(d, shift=(-2 * C) % (2 * WC), axis=1)  # (bw[W-1]=0)
        return jnp.where(even_w, d + aw * (xm1 - d), d + bw * (xp1 - d))

    o_ref[0, :, 0, :] = w_phase(even_h).astype(o_ref.dtype)
    o_ref[0, :, 1, :] = w_phase(odd_h).astype(o_ref.dtype)


def _upsample2x_flat_fwd(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    B, H, W, C = x.shape
    WC = W * C
    rows = 32 if H >= 32 else 8
    rows = min(rows, 32 if 2 * WC <= 8192 else 8)
    while H % rows:
        rows //= 2
    nb = H // rows

    x3 = x.reshape(B, nb, rows, WC)
    stripe = pl.BlockSpec(
        (1, 1, rows, WC), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    edge_up = pl.BlockSpec(
        (1, 1, 8, WC),
        lambda b, i: (b, jnp.maximum(i - 1, 0), rows // 8 - 1, 0),
        memory_space=pltpu.VMEM,
    )
    edge_dn = pl.BlockSpec(
        (1, 1, 8, WC),
        lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _upsample_flat_kernel, rows=rows, W=W, C=C, H=H
    )
    # output written as a (B, H, 2, 2WC) phase view of (B, 2H, 2W, C):
    # (2H) splits to (H, 2) for free, so H-interleave costs nothing
    out = pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[stripe, edge_up, edge_dn],
        out_specs=pl.BlockSpec(
            (1, rows, 2, 2 * WC), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, 2 * WC), x.dtype),
    )(x3, x3, x3)
    return out.reshape(B, 2 * H, 2 * W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x_flat(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas flat-layout `upsample2x_align_corners` for NHWC bf16/f32.

    Falls back to the einsum path for shapes the kernel doesn't support
    (H not divisible by 8, or W*C not lane-aligned)."""
    B, H, W, C = x.shape
    if H < 8 or H % 8 or (W * C) % 128:
        # NB bilinear_resize directly — upsample2x_align_corners would
        # re-dispatch here under LMNET_UPSAMPLE_BACKEND=flat
        from lmnet_tpu.ops.resize import bilinear_resize

        return bilinear_resize(x, (2 * H, 2 * W), align_corners=True)
    return _upsample2x_flat_fwd(x, interpret)


def _fwd(x, interpret):
    # residual = a zero-size probe carrying x's shape/dtype (custom_vjp
    # residual leaves must be jax types, not raw shapes/dtypes)
    return upsample2x_flat(x, interpret), jnp.zeros((0,) + x.shape, x.dtype)


def _bwd(interpret, probe, g):
    _, B, H, W, C = probe.shape
    # exact adjoint of the 2-tap lerp: transposed interpolation matrices
    # (same einsum class the training path already uses)
    from lmnet_tpu.ops.resize import _lerp_matrix

    mh = jnp.asarray(_lerp_matrix(H, 2 * H, True), jnp.float32)
    mw = jnp.asarray(_lerp_matrix(W, 2 * W, True), jnp.float32)
    gf = g.astype(jnp.float32)
    gf = jnp.einsum("oh,bowc->bhwc", mh, gf)
    gf = jnp.einsum("ow,bhoc->bhwc", mw, gf)
    return (gf.astype(probe.dtype),)


upsample2x_flat.defvjp(_fwd, _bwd)
