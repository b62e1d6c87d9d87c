"""Fully fused flat-layout NATT block: LN -> qkv -> NAT -> proj(+res) ->
LN -> MLP(+res), one Pallas kernel, one HBM read + one write.

STATUS: NEGATIVE RESULT — correct (tests/test_natt_flat.py) but measured
2x SLOWER than the unfused XLA interior (55.7 ms vs 28.1 ms, natt4 at
B=128 on v5e): every per-pixel C-mixing (qkv/proj/fc/LN) costs an O(C)
cross-lane roll ladder, and a VPU lane rotation costs ~2x a plain vector
op, so the ~160 rolls swamp the HBM-pass savings.  Kept as a documented
dead end: dense C-mixing belongs on the MXU, not the VPU.  Not wired into
the serve path (serve/engine.py::_natt).

Why: at the NATT stages' channel widths (12/24) every XLA rank-4 op pays
a ~6x lane-padding tax — a bare residual add at 256^2 x 12, B=128 measures
2.85 ms against a 0.49 ms HBM bound, and the natt4 block spends 21 ms in
ten such passes around a 6.8 ms NAT kernel (perf/natt_probe.py).  In flat
``(B, H, W*C)`` form the lanes are dense, so the whole block interior runs
as VPU work on one in-VMEM stripe.

The only non-elementwise pieces are per-pixel C-mixings (LayerNorm
reductions, the qkv/proj/fc matmuls).  In flat form a (C -> C) matmul is

    out[w*C + d] = sum_c  Wmat[c, d] * x[w*C + c]
                 = sum_{delta=-(C-1)}^{C-1} roll(x, -delta)[l] * tbl[delta][l]

with ``tbl[delta][l] = Wmat[(l%C)+delta, l%C]`` (zero outside the segment)
— a (2C-1)-step roll-FMA ladder whose rolls are SHARED between every
matrix applied to the same input (q, k, v share one ladder; LN's sum and
sum-of-squares share another).  Trace-time tables, no gathers, no MXU.

Replaces ``serve.engine._natt`` for the two high-resolution stages
(natt4 at 256^2 x 12, natt3 at 128^2 x 24) where the lane tax dominates;
the wider stages (48/96 channels) keep the XLA interior + bare NAT kernel
(lane utilization is fine there and the ladder grows as O(C)).

Numerics: fp32 compute in VMEM, tanh GELU (the serving default), NATTEN
border semantics identical to ``nat_flat``.  Pinned against the unfused
path by tests/test_natt_flat.py.

Reference: core/modules.py:504-521 (NATLayer) via models/blocks.py
::NeighborhoodTransformer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmnet_tpu.ops.pallas.nat_flat import _bias_table_flat, _seg_sum_broadcast

LN_EPS = 1e-5


def _roll_table(Wmat: jnp.ndarray, W: int) -> jnp.ndarray:
    """(C, C) matrix -> (2C-1, W*C) roll-FMA table (delta = row - (C-1))."""
    C = Wmat.shape[0]
    d = np.tile(np.arange(C), W)  # lane -> output channel
    rows = []
    for delta in range(-(C - 1), C):
        c = d + delta
        valid = (c >= 0) & (c < C)
        rows.append(jnp.where(
            jnp.asarray(valid),
            Wmat[np.clip(c, 0, C - 1), d],
            0.0,
        ))
    return jnp.stack(rows, 0).astype(jnp.float32)


def _lnsum_table(C: int, W: int) -> jnp.ndarray:
    """Roll table computing the segment mean (ones/C matrix)."""
    return _roll_table(jnp.full((C, C), 1.0 / C), W)


def _tile(vec: jnp.ndarray, W: int) -> jnp.ndarray:
    """(C,) per-channel vector -> (W*C,) flat lane vector."""
    return jnp.tile(vec.astype(jnp.float32), W)


def fold_natt_weights(p: dict, C: int, W: int, heads: int) -> dict:
    """Fold a NATT block's param subtree (serve layout: embed/norm1/attn/
    norm2/mlp) into kernel tables. All trace-time constants."""
    hd = C // heads
    scale = float(hd) ** -0.5
    wqkv = p["attn"]["qkv"]["dense"]["kernel"]  # (C, 3C)
    bqkv = p["attn"]["qkv"]["dense"]["bias"]
    wf1 = p["mlp"]["fc1"]["dense"]["kernel"]  # (C, 2C)
    bf1 = p["mlp"]["fc1"]["dense"]["bias"]
    wf2 = p["mlp"]["fc2"]["dense"]["kernel"]  # (2C, C)
    tables = jnp.stack([
        _roll_table(wqkv[:, :C] * scale, W),      # q (NAT scale folded in)
        _roll_table(wqkv[:, C : 2 * C], W),       # k
        _roll_table(wqkv[:, 2 * C :], W),         # v
        _roll_table(p["attn"]["proj"]["dense"]["kernel"], W),
        _roll_table(wf1[:, :C], W),               # fc1 -> h1
        _roll_table(wf1[:, C:], W),               # fc1 -> h2
        _roll_table(wf2[:C], W),                  # h1 -> fc2
        _roll_table(wf2[C:], W),                  # h2 -> fc2
    ])  # (8, 2C-1, WC)
    biases = jnp.stack([
        _tile(bqkv[:C] * scale, W),
        _tile(bqkv[C : 2 * C], W),
        _tile(bqkv[2 * C :], W),
        _tile(p["attn"]["proj"]["dense"]["bias"], W),
        _tile(bf1[:C], W),
        _tile(bf1[C:], W),
        _tile(p["mlp"]["fc2"]["dense"]["bias"], W),
        _tile(p["norm1"]["scale"], W),
        _tile(p["norm1"]["bias"], W),
        _tile(p["norm2"]["scale"], W),
        _tile(p["norm2"]["bias"], W),
    ])  # (11, WC)
    return dict(
        tables=tables,
        biases=biases,
        lnsum=_lnsum_table(C, W),
        rpb_flat=_bias_table_flat(p["attn"]["rpb"], W, C),
    )


# bias row indices
_BQ, _BK, _BV, _BPROJ, _BF1A, _BF1B, _BF2, _LN1W, _LN1B, _LN2W, _LN2B = range(11)


def _natt_kernel(
    eu_ref, ec_ref, ed_ref, wt_ref, b_ref, ln_ref, rpb_ref, o_ref, escr,
    *, rows: int, C: int, W: int, heads: int,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = ec_ref.shape[2]
    hd = C // heads
    nd = 2 * C - 1

    def rollmm(x, tbl_rows):
        """Shared-roll FMA ladder: apply several roll tables to one input.
        tbl_rows: list of (2C-1, WC)-indexable getters; returns one acc per
        table."""
        accs = [x * t[C - 1][None, :] for t in tbl_rows]
        for i in range(nd):
            delta = i - (C - 1)
            if delta == 0:
                continue
            xs = pltpu.roll(x, shift=(-delta) % WC, axis=x.ndim - 1)
            for j, t in enumerate(tbl_rows):
                accs[j] = accs[j] + xs * t[i][None, :]
        return accs

    class _T:
        """Index view of a stacked table ref."""

        def __init__(self, ref, k):
            self.ref, self.k = ref, k

        def __getitem__(self, i):
            return self.ref[self.k, i]

    def layer_norm(x, wrow, brow):
        xx = x * x
        # mean and mean-of-squares share the roll ladder
        m, m2 = rollmm_pair(x, xx)
        var = m2 - m * m
        y = (x - m) * jax.lax.rsqrt(var + LN_EPS)
        return y * b_ref[wrow][None, :] + b_ref[brow][None, :]

    def rollmm_pair(x, y):
        """lnsum ladder applied to two tensors with shared table rows."""
        accx = x * ln_ref[C - 1][None, :]
        accy = y * ln_ref[C - 1][None, :]
        for i in range(nd):
            delta = i - (C - 1)
            if delta == 0:
                continue
            t = ln_ref[i][None, :]
            accx = accx + pltpu.roll(x, shift=(-delta) % WC, axis=1) * t
            accy = accy + pltpu.roll(y, shift=(-delta) % WC, axis=1) * t
        return accx, accy

    # ---- halo emb stripe --------------------------------------------------
    escr[0] = eu_ref[0, rows - 1]
    escr[1 : rows + 1] = ec_ref[0]
    escr[rows + 1] = ed_ref[0, 0]
    e = escr[:].astype(jnp.float32)  # (rows+2, WC)

    # ---- LN1 + qkv on the halo rows ---------------------------------------
    xn = layer_norm(e, _LN1W, _LN1B)
    q_all, k, v = rollmm(xn, [_T(wt_ref, 0), _T(wt_ref, 1), _T(wt_ref, 2)])
    q_all = q_all + b_ref[_BQ][None, :]
    k = k + b_ref[_BK][None, :]
    v = v + b_ref[_BV][None, :]

    # ---- NAT (mirrors nat_flat's stripe kernel) ---------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    first_mask = lane < C
    last_mask = lane >= WC - C

    def shifted(full, ow):
        base = pltpu.roll(full, shift=((1 - ow) * C) % WC, axis=full.ndim - 1)
        fix0 = pltpu.roll(full, shift=(-ow * C) % WC, axis=full.ndim - 1)
        fixN = pltpu.roll(full, shift=((2 - ow) * C) % WC, axis=full.ndim - 1)
        base = jnp.where(first_mask, fix0, base)
        return jnp.where(last_mask, fixN, base)

    kws = [shifted(k, ow) for ow in range(3)]
    vws = [shifted(v, ow) for ow in range(3)]

    def attend(q, row_sl, ci):
        ls = []
        for oh in range(3):
            for ow in range(3):
                prod = q * row_sl(kws[ow], oh)
                l = _seg_sum_broadcast(prod, hd, C)
                ls.append(l + rpb_ref[ci, oh * 3 + ow][None, :])
        m = ls[0]
        for l in ls[1:]:
            m = jnp.maximum(m, l)
        es = [jnp.exp(l - m) for l in ls]
        den = es[0]
        for ee in es[1:]:
            den = den + ee
        inv = 1.0 / den
        out = jnp.zeros_like(q)
        i = 0
        for oh in range(3):
            for ow in range(3):
                out = out + (es[i] * inv) * row_sl(vws[ow], oh)
                i += 1
        return out

    # query center rows are halo rows 1..rows; window rows for query halo
    # row 1+r start at halo row r+oh
    nat = attend(q_all[1 : rows + 1], lambda a, oh: a[oh : oh + rows], 1)

    # image top/bottom rows: slid window + border bias case, selected in
    # by row mask (cheap: one extra 1-row attend each per stripe)
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    top = attend(q_all[1:2], lambda a, oh: a[1 + oh : 2 + oh], 2)
    bot = attend(
        q_all[rows : rows + 1], lambda a, oh: a[rows - 2 + oh : rows - 1 + oh], 0
    )
    nat = jnp.where((ib == 0) & (rid == 0), jnp.broadcast_to(top, nat.shape), nat)
    nat = jnp.where(
        (ib == nb - 1) & (rid == rows - 1), jnp.broadcast_to(bot, nat.shape), nat
    )

    # ---- proj + residual, LN2, MLP + residual -----------------------------
    att = rollmm(nat, [_T(wt_ref, 3)])[0] + b_ref[_BPROJ][None, :] + e[1 : rows + 1]
    a2 = layer_norm(att, _LN2W, _LN2B)
    h1, h2 = rollmm(a2, [_T(wt_ref, 4), _T(wt_ref, 5)])
    h1 = jax.nn.gelu(h1 + b_ref[_BF1A][None, :], approximate=True)
    h2 = jax.nn.gelu(h2 + b_ref[_BF1B][None, :], approximate=True)
    out = (
        rollmm(h1, [_T(wt_ref, 6)])[0]
        + rollmm(h2, [_T(wt_ref, 7)])[0]
        + b_ref[_BF2][None, :]
        + att
    )
    o_ref[0] = out.astype(o_ref.dtype)


def natt_flat_interior(
    emb: jnp.ndarray,
    fw: dict,
    heads: int,
    C: int,
    W: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused NATT interior on flat (B, H, W*C) embeddings: returns
    mlp(ln2(proj(NAT(qkv(ln1(emb)))) + emb)) + att — everything after the
    patch-embed conv.  ``fw`` from ``fold_natt_weights``."""
    B, H, WC = emb.shape
    assert WC == W * C
    hd = C // heads
    assert hd & (hd - 1) == 0, "segment trees need power-of-2 head_dim"
    rows = 16 if H >= 16 else 8
    while H % rows:
        rows //= 2
    assert rows >= 2 and H >= 8, "shape too small for the fused NATT kernel"
    nb = H // rows

    stripe = lambda im: pl.BlockSpec((1, rows, WC), im, memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_natt_kernel, rows=rows, C=C, W=W, heads=heads)
    return pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0)),
            stripe(lambda b, i: (b, i, 0)),
            stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0)),
            full(fw["tables"].shape),
            full(fw["biases"].shape),
            full(fw["lnsum"].shape),
            full(fw["rpb_flat"].shape),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, WC), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), emb.dtype),
        scratch_shapes=[pltpu.VMEM((rows + 2, WC), emb.dtype)],
    )(emb, emb, emb, fw["tables"], fw["biases"], fw["lnsum"], fw["rpb_flat"])
