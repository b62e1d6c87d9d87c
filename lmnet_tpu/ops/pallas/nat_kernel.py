"""Fused Pallas TPU kernel for neighborhood attention (NATTEN semantics).

Replaces the reference's NATTEN CUDA operator (reference
``core/modules.py:18,509``) on the hot path.  The XLA formulation
(``lmnet_tpu.ops.nat``) materializes (B,H,W,heads,k^2) logits in HBM; this
kernel fuses logits -> bias -> softmax -> weighted sum entirely on-chip.

Layout: LM-Net's NAT channel counts are tiny (12..96), so a channels-last
VMEM tile would waste up to 10.7x of every vector register (C=12 padded to
128 lanes).  The kernel therefore runs in **(C, W) orientation** — channels
on sublanes, image width on lanes — where padding is negligible; the
wrapper transposes NHWC -> NHCW around the call (cheap relayout vs. the
XLA path's 9x window materialization).

Structure:
  grid = (B, H / ROWS)
  * q and the output are pipelined through VMEM in ROWS-row stripes;
  * the k/v halo (ROWS+2 rows) is assembled into VMEM scratch from three
    BlockSpec-pipelined stripes whose index maps are the clamped neighbor
    stripe indices (i-1, i, i+1) — overlapping windows without manual DMA;
  * NATTEN's clamped windows: contributing rows are
    clip(i-1, 0, H-3) + {0,1,2}; column shifts are lane rolls with two
    edge-column fixups — no gathers anywhere;
  * per-head logit reduction is seg(heads,C) @ (q*k)(C,W) and the
    attn->channel broadcast is segT(C,heads) @ attn(heads,W): tiny
    full-precision MXU matmuls against a constant head-segment matrix;
  * softmax over the 9 window slots runs in registers.

Relative-position bias: for k=3 the bias index collapses to 3 border cases
per axis, so the full field is a (3, 9, heads, W) table precomputed at
trace time and selected by row case inside the kernel.

Backward: runs through the XLA formulation via custom_vjp (identical
gradients; fast fused forward).  A fused backward kernel is future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmnet_tpu.ops import nat as nat_xla


def _bias_table(rpb: jnp.ndarray, W: int, kernel_size: int = 3) -> jnp.ndarray:
    """(3, k*k, heads, W) bias table; axis 0 = row border case
    (0: bottom row, 1: interior, 2: top row)."""
    k = kernel_size
    cj = np.ones((W,), np.int32)  # column border case per column
    cj[0] = 2
    cj[W - 1] = 0
    out = []
    for ci in range(3):
        per_offset = []
        for oh in range(k):
            for ow in range(k):
                per_offset.append(rpb[:, oh + ci, :][:, ow + cj])  # (heads, W)
        out.append(jnp.stack(per_offset, 0))  # (9, heads, W)
    return jnp.stack(out, 0)


def _shift_cols(x: jnp.ndarray, ow: int, W: int) -> jnp.ndarray:
    """Clamped-window column shift on (C, W): out[:, j] = x[:, clip(j-1, 0, W-3) + ow]."""
    shift = (1 - ow) % W  # pltpu.roll requires non-negative shift
    base = pltpu.roll(x, shift=shift, axis=1) if shift != 0 else x
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    base = jnp.where(col == 0, x[:, ow : ow + 1], base)
    base = jnp.where(col == W - 1, x[:, W - 3 + ow : W - 2 + ow], base)
    return base


def _shift_cols_nd(x: jnp.ndarray, ow: int, W: int) -> jnp.ndarray:
    """Same clamped-window column shift on (..., C, W) (last axis = W)."""
    ax = x.ndim - 1
    shift = (1 - ow) % W
    base = pltpu.roll(x, shift=shift, axis=ax) if shift != 0 else x
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    base = jnp.where(col == 0, x[..., ow : ow + 1], base)
    base = jnp.where(col == W - 1, x[..., W - 3 + ow : W - 2 + ow], base)
    return base


def _nat_kernel(
    q_ref, ku_ref, kc_ref, kd_ref, vu_ref, vc_ref, vd_ref,
    bias_ref, seg_ref, segt_ref, o_ref, kscr, vscr,
    *, rows: int, scale: float, H: int, vectorized: bool,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    C, W = q_ref.shape[2], q_ref.shape[3]

    # assemble the (rows+2)-row halo window into VMEM scratch
    # (window rows ib*rows-1 .. ib*rows+rows; edges never read at borders)
    kscr[0] = ku_ref[0, rows - 1]
    kscr[1 : rows + 1] = kc_ref[0]
    kscr[rows + 1] = kd_ref[0, 0]
    vscr[0] = vu_ref[0, rows - 1]
    vscr[1 : rows + 1] = vc_ref[0]
    vscr[rows + 1] = vd_ref[0, 0]

    precise = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    seg = seg_ref[:]  # (heads, C)
    segt = segt_ref[:]  # (C, heads)

    if vectorized:
        # ---- vectorized interior: every row of the stripe at once ---------
        # Interior rows use window start gi-1, i.e. halo rows [r+oh] for
        # r in [0, rows). The image's very top/bottom rows (clamped windows)
        # are recomputed by the fixup below and simply overwritten here.
        # Head reductions/broadcasts are sublane-group ops, no matmuls.
        heads = bias_ref.shape[2]
        hd = C // heads
        q_all = q_ref[0].astype(jnp.float32) * scale  # (rows, C, W)
        logits = []
        for oh in range(3):
            k_blk = kscr[oh : oh + rows].astype(jnp.float32)  # (rows, C, W)
            for ow in range(3):
                ks = _shift_cols_nd(k_blk, ow, W)
                prod = q_all * ks
                if hd == 1:
                    l = prod
                else:
                    l = jnp.concatenate(
                        [
                            jnp.sum(prod[:, h * hd : (h + 1) * hd, :], axis=1, keepdims=True)
                            for h in range(heads)
                        ],
                        axis=1,
                    )  # (rows, heads, W)
                logits.append(l + bias_ref[1, oh * 3 + ow][None, :, :])
        L = jnp.stack(logits, 0)  # (9, rows, heads, W)
        m = jnp.max(L, axis=0)
        e = jnp.exp(L - m[None])
        attn = e / jnp.sum(e, axis=0)[None]

        out = jnp.zeros((rows, C, W), jnp.float32)
        idx = 0
        for oh in range(3):
            v_blk = vscr[oh : oh + rows].astype(jnp.float32)
            for ow in range(3):
                vsel = _shift_cols_nd(v_blk, ow, W)
                a = attn[idx]  # (rows, heads, W)
                if hd == 1:
                    w_bc = a
                else:
                    w_bc = jnp.broadcast_to(
                        a[:, :, None, :], (rows, heads, hd, W)
                    ).reshape(rows, C, W)
                out = out + w_bc * vsel
                idx += 1
        o_ref[0] = out.astype(o_ref.dtype)
    else:
        # ---- row-loop path for narrow maps (W < 128: lane padding makes
        # stripe-wide temporaries too large) -------------------------------
        def row_body(r, _):
            gi = ib * rows + r
            si = jnp.clip(gi - 1, 0, H - 3)
            sl = si - (ib * rows - 1)
            qr = q_ref[0, r].astype(jnp.float32) * scale  # (C, W)
            krows = kscr[pl.ds(sl, 3)].astype(jnp.float32)
            vrows = vscr[pl.ds(sl, 3)].astype(jnp.float32)
            bias = bias_ref[si - gi + 2]  # (9, heads, W)
            ls = []
            for oh in range(3):
                krow = krows[oh]
                for ow in range(3):
                    ks = _shift_cols(krow, ow, W)
                    ls.append(
                        jnp.dot(seg, qr * ks, **precise) + bias[oh * 3 + ow]
                    )
            Lr = jnp.stack(ls, 0)
            er = jnp.exp(Lr - jnp.max(Lr, axis=0)[None])
            ar = er / jnp.sum(er, axis=0)[None]
            o = jnp.zeros((C, W), jnp.float32)
            i = 0
            for oh in range(3):
                vrow = vrows[oh]
                for ow in range(3):
                    vsel = _shift_cols(vrow, ow, W)
                    o = o + jnp.dot(segt, ar[i], **precise) * vsel
                    i += 1
            o_ref[0, r] = o.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, rows, row_body, 0)
        return

    # ---- border-row fixups (clamped windows + border bias case) ----------
    def fix_row(r, sl, ci):
        qr = q_ref[0, r].astype(jnp.float32) * scale  # (C, W)
        krows = kscr[sl : sl + 3].astype(jnp.float32)  # (3, C, W)
        vrows = vscr[sl : sl + 3].astype(jnp.float32)
        ls = []
        for oh in range(3):
            krow = krows[oh]
            for ow in range(3):
                ks = _shift_cols(krow, ow, W)
                l = jnp.dot(seg, qr * ks, **precise)  # (heads, W)
                ls.append(l + bias_ref[ci, oh * 3 + ow])
        Lr = jnp.stack(ls, 0)
        er = jnp.exp(Lr - jnp.max(Lr, axis=0)[None])
        ar = er / jnp.sum(er, axis=0)[None]
        o = jnp.zeros((C, W), jnp.float32)
        i = 0
        for oh in range(3):
            vrow = vrows[oh]
            for ow in range(3):
                vsel = _shift_cols(vrow, ow, W)
                o = o + jnp.dot(segt, ar[i], **precise) * vsel
                i += 1
        o_ref[0, r] = o.astype(o_ref.dtype)

    @pl.when(ib == 0)
    def _():
        # image top row: window rows 0..2 = halo rows 1..3, bias case 2
        fix_row(0, 1, 2)

    @pl.when(ib == nb - 1)
    def _():
        # image bottom row: window rows H-3..H-1 = halo rows rows-2..rows,
        # bias case 0
        fix_row(rows - 1, rows - 2, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def neighborhood_attention_pallas(q, k, v, rpb, kernel_size: int = 3):
    """Drop-in fused NAT (forward = Pallas kernel, backward = XLA path).

    Same contract as ``ops.nat.neighborhood_attention`` with kernel_size=3.
    """
    return _nat_forward(q, k, v, rpb, kernel_size)


def _nat_forward(q, k, v, rpb, kernel_size, interpret: bool = False):
    assert kernel_size == 3, "v1 kernel supports k=3 (the model's only size)"
    B, H, W, C = q.shape
    heads = rpb.shape[0]
    hd = C // heads
    scale = float(hd) ** -0.5
    if H < 8 or W < 3:
        return nat_xla.neighborhood_attention(q, k, v, rpb, kernel_size)

    vectorized = W >= 64  # below this, lane padding beats the row loop
    # stripe height: cap stripe-wide temporaries (which pad W up to 128
    # lanes) to keep scoped VMEM in budget
    rows = 8 if W >= 128 else 4 if vectorized else 16
    while H % rows:
        rows //= 2
    if rows < 2:
        # odd H: the stripe structure (top/bottom fixup rows) needs >=2 rows
        # per stripe; fall back to the XLA formulation (mirrors the H<8 guard)
        return nat_xla.neighborhood_attention(q, k, v, rpb, kernel_size)

    # channels-on-sublanes orientation (see module docstring)
    qT, kT, vT = (x.transpose(0, 1, 3, 2) for x in (q, k, v))  # (B, H, C, W)
    bias = _bias_table(rpb, W, kernel_size)
    seg = jnp.asarray(  # (heads, C) one-hot head segments
        np.kron(np.eye(heads, dtype=np.float32), np.ones((1, hd), np.float32))
    )

    nb = H // rows
    stripe = lambda im: pl.BlockSpec((1, rows, C, W), im, memory_space=pltpu.VMEM)
    up = stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    center = stripe(lambda b, i: (b, i, 0, 0))
    down = stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0))

    kernel = functools.partial(
        _nat_kernel, rows=rows, scale=scale, H=H, vectorized=vectorized
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            center,  # q
            up, center, down,  # k halo stripes
            up, center, down,  # v halo stripes
            pl.BlockSpec((3, 9, heads, W), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, heads), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, C, W), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, C, W), q.dtype),
            pltpu.VMEM((rows + 2, C, W), q.dtype),
        ],
    )(qT, kT, kT, kT, vT, vT, vT, bias, seg, seg.T)
    return out.transpose(0, 1, 3, 2)


def _fwd(q, k, v, rpb, kernel_size):
    return _nat_forward(q, k, v, rpb, kernel_size), (q, k, v, rpb)


def _bwd(kernel_size, residuals, g):
    q, k, v, rpb = residuals
    _, vjp = jax.vjp(
        lambda q, k, v, rpb: nat_xla.neighborhood_attention(q, k, v, rpb, kernel_size),
        q, k, v, rpb,
    )
    return vjp(g)


neighborhood_attention_pallas.defvjp(_fwd, _bwd)
