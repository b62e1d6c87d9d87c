"""Flat-layout fused neighborhood attention (k=3, NATTEN semantics).

Replaces ``nat_kernel.py``'s (C, W)-oriented kernel on the serving path.
That kernel is fast once data is in (B, H, C, W) orientation, but the
NHWC <-> NHCW HBM transposes around it cost more than the kernel itself
(measured ~1.6 ms per direction at 256^2 x 12, B=64 — vs ~1 ms of kernel).

This kernel works DIRECTLY on the network's flat ``(B, H, W*C)`` layout
(see rc_flat.py: W*C == 6144 at every LM-Net stage, so lanes are dense):

  * window column shifts are lane rotations by C (5 rolls per tensor:
    the 3 interior shifts plus 2 border-fix sources) — measured ~free;
  * NATTEN's clamped borders: the col-0 / col-(W-1) window slide is a
    select against the adjacent roll; row clamping reuses the stripe
    halo with dedicated first/last image-row fixups;
  * per-head logit sums within hd-wide lane segments use a log2(hd)
    shift-add tree, and the attn -> channel broadcast uses a log2(hd)
    select tree (hd == 1 at the hottest 256^2 stage: both are no-ops);
  * relative position bias is a trace-time (3, 9, W*C) table (row border
    case x window slot), column border cases pre-baked per lane.

Matches ops.nat.neighborhood_attention (the XLA/NATTEN-semantics
reference) to float tolerance; pinned by tests/test_nat_flat.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmnet_tpu.ops import nat as nat_xla


def _bias_table_flat(rpb: jnp.ndarray, W: int, C: int) -> jnp.ndarray:
    """(3, 9, W*C) flat bias table; axis 0 = row border case
    (0: bottom image row, 1: interior, 2: top image row)."""
    heads = rpb.shape[0]
    hd = C // heads
    cj = np.ones((W,), np.int32)  # column border case per column
    cj[0] = 2
    cj[W - 1] = 0
    head_of_lane = np.repeat(np.arange(heads), hd)  # (C,)
    out = []
    for ci in range(3):
        per_offset = []
        for oh in range(3):
            for ow in range(3):
                b = rpb[:, oh + ci, :][:, ow + cj]  # (heads, W)
                flat = jnp.transpose(b, (1, 0))[:, head_of_lane].reshape(-1)
                per_offset.append(flat)  # (W*C,)
        out.append(jnp.stack(per_offset, 0))
    return jnp.stack(out, 0)  # (3, 9, W*C)


def _seg_sum_broadcast(x, hd: int, C: int):
    """Sum within hd-wide lane segments, result broadcast across the
    segment. x: (..., WC). Masks come from in-kernel iota (no captured
    constants)."""
    if hd == 1:
        return x
    WC = x.shape[-1]
    seg_pos = jax.lax.broadcasted_iota(jnp.int32, (1, WC), 1) % hd
    s = 1
    t = x
    while s < hd:  # shift-add tree: t[j] accumulates prod[j..j+2s-1]
        t = t + pltpu.roll(t, shift=(-s) % WC, axis=t.ndim - 1)
        s *= 2
    # t[j] is the full segment sum only at segment starts; broadcast it
    v = t
    s = 1
    while s < hd:
        rolled = pltpu.roll(v, shift=s, axis=v.ndim - 1)
        v = jnp.where((seg_pos % (2 * s)) >= s, rolled, v)
        s *= 2
    return v


def _nat_flat_kernel(
    q_ref, ku_ref, kc_ref, kd_ref, vu_ref, vc_ref, vd_ref,
    bias_ref, o_ref, kscr, vscr,
    *, rows: int, C: int, W: int, heads: int, scale: float,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = q_ref.shape[2]
    hd = C // heads

    # halo: window rows ib*rows-1 .. ib*rows+rows (borders fixed up below)
    kscr[0] = ku_ref[0, rows - 1]
    kscr[1 : rows + 1] = kc_ref[0]
    kscr[rows + 1] = kd_ref[0, 0]
    vscr[0] = vu_ref[0, rows - 1]
    vscr[1 : rows + 1] = vc_ref[0]
    vscr[rows + 1] = vd_ref[0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    first_mask = lane < C  # output column 0
    last_mask = lane >= WC - C  # output column W-1

    def shifted(full, ow):
        """Clamped-window column shift on (..., WC) flat rows."""
        base = pltpu.roll(full, shift=((1 - ow) * C) % WC, axis=full.ndim - 1)
        # col 0 needs source col ow  -> roll by -ow*C
        fix0 = pltpu.roll(full, shift=(-ow * C) % WC, axis=full.ndim - 1)
        # col W-1 needs source col W-3+ow -> roll by (2-ow)*C
        fixN = pltpu.roll(full, shift=((2 - ow) * C) % WC, axis=full.ndim - 1)
        base = jnp.where(first_mask, fix0, base)
        return jnp.where(last_mask, fixN, base)

    kf = kscr[:].astype(jnp.float32)  # (rows+2, WC)
    vf = vscr[:].astype(jnp.float32)
    kws = [shifted(kf, ow) for ow in range(3)]
    vws = [shifted(vf, ow) for ow in range(3)]

    def attend(q, row_sl, ci):
        """q: (n, WC) query rows; row_sl(oh) -> halo row slice; ci: bias case."""
        ls = []
        for oh in range(3):
            for ow in range(3):
                prod = q * row_sl(kws[ow], oh)
                l = _seg_sum_broadcast(prod, hd, C)
                ls.append(l + bias_ref[ci, oh * 3 + ow][None, :])
        m = ls[0]
        for l in ls[1:]:
            m = jnp.maximum(m, l)
        es = [jnp.exp(l - m) for l in ls]
        den = es[0]
        for e in es[1:]:
            den = den + e
        inv = 1.0 / den
        out = jnp.zeros_like(q)
        i = 0
        for oh in range(3):
            for ow in range(3):
                out = out + (es[i] * inv) * row_sl(vws[ow], oh)
                i += 1
        return out

    q_all = q_ref[0].astype(jnp.float32) * scale  # (rows, WC)

    # interior: window start row = global_row - 1 = halo row r  (r in [0,rows))
    out = attend(q_all, lambda a, oh: a[oh : oh + rows], 1)
    o_ref[0] = out.astype(o_ref.dtype)

    # image top row: window rows 0..2 = halo rows 1..3, bias case 2
    @pl.when(ib == 0)
    def _():
        fixed = attend(q_all[0:1], lambda a, oh: a[1 + oh : 2 + oh], 2)
        o_ref[0, 0:1] = fixed.astype(o_ref.dtype)

    # image bottom row: window rows H-3..H-1 = halo rows rows-2..rows, case 0
    @pl.when(ib == nb - 1)
    def _():
        fixed = attend(
            q_all[rows - 1 : rows], lambda a, oh: a[rows - 2 + oh : rows - 1 + oh], 0
        )
        o_ref[0, rows - 1 : rows] = fixed.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def nat_flat(q, k, v, rpb, heads: int, C: int, W: int,
             scale: float | None = None, interpret: bool = False):
    """Fused NAT (k=3) on flat (B, H, W*C) activations.

    ``scale`` (default head_dim**-0.5) is applied to q inside the kernel
    (free in VMEM — no extra HBM pass). Returns (B, H, W*C).
    """
    B, H, WC = q.shape
    assert WC == W * C
    if scale is None:
        scale = float(C // heads) ** -0.5
    rows = 32 if H >= 32 else 8
    while H % rows:
        rows //= 2
    if rows < 2 or H < 8:
        out = nat_xla.neighborhood_attention(
            q.reshape(B, H, W, C), k.reshape(B, H, W, C), v.reshape(B, H, W, C),
            rpb, 3, scale=scale,
        )
        return out.reshape(B, H, WC)
    nb = H // rows

    bias = _bias_table_flat(rpb, W, C)

    stripe = lambda im: pl.BlockSpec((1, rows, WC), im, memory_space=pltpu.VMEM)
    up = stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0))
    center = stripe(lambda b, i: (b, i, 0))
    down = stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0))

    kernel = functools.partial(
        _nat_flat_kernel, rows=rows, C=C, W=W, heads=heads, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            center,
            up, center, down,
            up, center, down,
            pl.BlockSpec((3, 9, WC), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, WC), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, WC), q.dtype),
            pltpu.VMEM((rows + 2, WC), q.dtype),
        ],
    )(q, k, k, k, v, v, v, bias)


def _nat_flat_ref(q, k, v, rpb, heads, C, W, scale):
    B, H, WC = q.shape
    out = nat_xla.neighborhood_attention(
        q.reshape(B, H, W, C), k.reshape(B, H, W, C), v.reshape(B, H, W, C),
        rpb, 3, scale=(float(C // heads) ** -0.5 if scale is None else scale),
    )
    return out.reshape(B, H, WC)


def _nat_flat_fwd(q, k, v, rpb, heads, C, W, scale, interpret):
    return nat_flat(q, k, v, rpb, heads, C, W, scale, interpret), (q, k, v, rpb)


def _nat_flat_bwd(heads, C, W, scale, interpret, res, g):
    q, k, v, rpb = res
    _, vjp = jax.vjp(
        lambda q, k, v, rpb: _nat_flat_ref(q, k, v, rpb, heads, C, W, scale),
        q, k, v, rpb,
    )
    return vjp(g)


nat_flat.defvjp(_nat_flat_fwd, _nat_flat_bwd)
