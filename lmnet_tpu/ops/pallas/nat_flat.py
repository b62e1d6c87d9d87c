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


def _stripe_policy(H: int, WC: int) -> tuple[int, bool]:
    """(stripe rows, twopass) for the forward kernel.

    Scoped-vmem caps under the HOLD form (all measured): 32-row stripes
    fit at WC=3072 (256^2) but overflow the 16 MB limit at WC=4608
    (384^2: 16.67M); 16-row stripes fit at 4608 but overflow at WC=6144
    (512^2: 16.34M — the f32 bias table and 8-row edge blocks scale with
    WC, so the boundary is not a pure rows*WC product). NB a pure-product
    cap that shrank 256^2 to 16-row stripes cost ~17% e2e serving
    throughput.  Above WC=3072 the TWOPASS form (recompute logits, hold
    only m/den/out — per-stage neutral at 256^2, perf/nat_fwd_ab.py)
    halves peak VMEM and buys the 32-row stripes back
    (perf/nat_stripe_ab.py: 384^2 -9% kernel time, 512^2 -27%).

    Those caps assume Mosaic's default 16 MB scoped-vmem limit; v5e has
    128 MB of VMEM per core, and pl.CompilerParams(vmem_limit_bytes=...)
    raises the limit for THIS kernel only (the global
    xla_tpu_scoped_vmem_limit_kib flag would also re-budget every XLA
    fusion).  With a 64 MB kernel budget the HOLD form keeps 32-row
    stripes at every LM-Net stage.

    Returns (rows, twopass, vmem_limit_bytes|None).
    Override for A/B: LMNET_NAT_STRIPE="rows,twopass,vmem_mb"
    (e.g. "16,0,16").
    """
    import os

    ov = os.environ.get("LMNET_NAT_STRIPE")
    base = 32 if H >= 32 else 8
    if ov:
        r, tp, mb = ov.split(",")
        lim = None if int(mb) == 16 else int(mb) * 2**20
        return min(base, int(r)), tp == "1", lim
    if WC <= 3072:
        return base, False, None
    return base, False, 64 * 2**20


def _nat_flat_kernel(
    q_ref, kc_ref, kpe_ref, kne_ref, vc_ref, vpe_ref, vne_ref,
    bias_ref, o_ref, kscr, vscr,
    *, rows: int, C: int, W: int, heads: int, scale: float,
    twopass: bool = False,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = q_ref.shape[2]
    hd = C // heads

    # halo: window rows ib*rows-1 .. ib*rows+rows (borders fixed up below).
    # The 1-row halos come from precomputed edge tensors (pe = previous
    # stripe's last row, ne = next stripe's first row) — fetching full
    # adjacent stripes tripled the k/v DMA traffic (~1 ms/call at B=128).
    kscr[0] = kpe_ref[0, 0, 7]
    kscr[1 : rows + 1] = kc_ref[0, 0]
    kscr[rows + 1] = kne_ref[0, 0, 0]
    vscr[0] = vpe_ref[0, 0, 7]
    vscr[1 : rows + 1] = vc_ref[0, 0]
    vscr[rows + 1] = vne_ref[0, 0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    first_mask = lane < C  # output column 0
    last_mask = lane >= WC - C  # output column W-1

    def all_shifted(full):
        """Clamped-window column shifts for ow = 0, 1, 2 on (..., WC) flat
        rows.  The 9 logical shifts (base/col-0 fix/col-(W-1) fix x 3 ow)
        only use 5 distinct roll amounts {-2C..2C}: roll ONCE per amount
        (cross-lane rotations cost ~2x a plain vector op — measured) and
        combine with masked selects."""
        r = {0: full}
        for s in (-2, -1, 1, 2):
            r[s] = pltpu.roll(full, shift=(s * C) % WC, axis=full.ndim - 1)
        out = []
        for ow in range(3):
            base = r[1 - ow]       # interior: source col w-1+ow
            fix0 = r[-ow]          # col 0: source col ow
            fixN = r[2 - ow]       # col W-1: source col W-3+ow
            base = jnp.where(first_mask, fix0, base)
            out.append(jnp.where(last_mask, fixN, base))
        return out

    # NOTE rolls must be fp32: Mosaic's tpu.dynamic_rotate rejects 16-bit
    # data ("Rotate with non-32-bit data"), so bf16-input rolls don't lower
    kf = kscr[:].astype(jnp.float32)  # (rows+2, WC)
    vf = vscr[:].astype(jnp.float32)
    kws = all_shifted(kf)
    vws = all_shifted(vf)

    def attend(q, row_sl, ci):
        """q: (n, WC) query rows; row_sl(oh) -> halo row slice; ci: bias case.

        Softmax runs in base 2: log2(e) is folded into the q scale and the
        trace-time bias table, so the 9 transcendentals are bare exp2
        (the VPU's exp is exp2(x*log2e) — folding removes the hidden
        multiply). The weighted sum accumulates UNNORMALIZED and scales by
        1/den once at the end (9 fewer (rows, WC) multiplies than
        normalizing each weight)."""
        def logit(oh, ow):
            prod = q * row_sl(kws[ow], oh)
            l = _seg_sum_broadcast(prod, hd, C)
            return l + bias_ref[ci, oh * 3 + ow][None, :]

        # NB a center-window softmax pivot (skip the 9-way max; saves 8
        # maxes + 1 sub + 1 exp2 per pass) measured e2e-NEUTRAL (1349 vs
        # 1348-1355 band) — the kernel is roll/DMA-bound, not
        # transcendental-bound. Exact max kept for overflow robustness.
        # NB2 register-pressure restructurings (perf/nat_fwd_ab.py: flash-
        # style logit recompute, 8/16-row q chunking) are ALSO neutral-to-
        # worse at every stage at 256^2 — holding the 9 logit + 9 exp
        # stripes is free; Mosaic's VMEM scheduling absorbs the ~7 MB
        # live set.  The recompute form survives as ``twopass``: per-stage
        # it is NEUTRAL, but it cuts peak scoped VMEM ~2x, which buys
        # 32-row stripes at WC>3072 where the hold form caps at 16/8 —
        # there the halo-DMA amortization wins e2e (see nat_flat()).
        if twopass:
            m = logit(0, 0)
            for i in range(1, 9):
                m = jnp.maximum(m, logit(i // 3, i % 3))
            den = jnp.zeros_like(q)
            out = jnp.zeros_like(q)
            for oh in range(3):
                for ow in range(3):
                    e = jnp.exp2(logit(oh, ow) - m)
                    den = den + e
                    out = out + e * row_sl(vws[ow], oh)
            return out * (1.0 / den)
        ls = [logit(i // 3, i % 3) for i in range(9)]
        m = ls[0]
        for l in ls[1:]:
            m = jnp.maximum(m, l)
        es = [jnp.exp2(l - m) for l in ls]
        den = es[0]
        for e in es[1:]:
            den = den + e
        out = jnp.zeros_like(q)
        i = 0
        for oh in range(3):
            for ow in range(3):
                out = out + es[i] * row_sl(vws[ow], oh)
                i += 1
        return out * (1.0 / den)

    LOG2E = 1.4426950408889634
    q_all = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # (rows, WC)

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
    hd = C // heads
    rows, twopass, vmem_limit = _stripe_policy(H, WC)
    while H % rows:
        rows //= 2
    # the segment shift-add/select trees require power-of-2 head_dim;
    # rows < 8 (H not divisible by 8, e.g. 224^2 inputs -> H=28 stages)
    # cannot feed the 8-row halo edge blocks below
    if rows < 8 or H < 8 or (hd & (hd - 1)):
        out = nat_xla.neighborhood_attention(
            q.reshape(B, H, W, C), k.reshape(B, H, W, C), v.reshape(B, H, W, C),
            rpb, 3, scale=scale,
        )
        return out.reshape(B, H, WC)
    nb = H // rows

    # base-2 softmax: log2(e) folds into the bias table (trace-time) and
    # the q scale (see _nat_flat_kernel.attend)
    bias = _bias_table_flat(rpb, W, C) * 1.4426950408889634

    # 1-row halos are fetched as single-row blocks of a FREE stripe-major
    # view (B, nb, rows, WC) — fetching full adjacent stripes tripled the
    # k/v DMA traffic, and XLA-side edge gathers cost more than they saved
    # (both measured)
    k4 = k.reshape(B, nb, rows, WC)
    v4 = v.reshape(B, nb, rows, WC)

    # edge blocks are 8 rows (Pallas requires the second-minor block dim
    # divisible by 8): the predecessor's LAST 8 rows / successor's FIRST 8,
    # of which the kernel uses one — still 2x less halo DMA than fetching
    # full neighbor stripes
    stripe = pl.BlockSpec(
        (1, 1, rows, WC), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    edge_up = pl.BlockSpec(
        (1, 1, 8, WC),
        lambda b, i: (b, jnp.maximum(i - 1, 0), rows // 8 - 1, 0),
        memory_space=pltpu.VMEM,
    )
    edge_dn = pl.BlockSpec(
        (1, 1, 8, WC), lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _nat_flat_kernel, rows=rows, C=C, W=W, heads=heads, scale=scale,
        twopass=twopass,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, rows, WC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stripe, edge_up, edge_dn,
            stripe, edge_up, edge_dn,
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
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
            if vmem_limit
            else None
        ),
    )(q, k4, k4, k4, v4, v4, v4, bias)


def _nat_flat_bwd_kernel(
    q_ref, g_ref,
    ku_ref, kc_ref, kd_ref, vu_ref, vc_ref, vd_ref,
    bias_ref,
    dq_ref, dkh_ref, dvh_ref, dbias_ref,
    kscr, vscr,
    *, rows: int, C: int, W: int, heads: int, scale: float,
):
    """Fused NAT backward: recompute the softmax from (q, k, bias) in VMEM
    (flash-attention style — nothing saved from the forward but the primals),
    then dq / per-stripe dk,dv halo contributions / flat dbias partials.

    Structure mirrors ``_nat_flat_kernel``: same stripes, same lane-rotation
    window shifts; every scatter is the exact adjoint of a forward gather.
    """
    b = pl.program_id(0)
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = q_ref.shape[2]
    hd = C // heads

    @pl.when((b == 0) & (ib == 0))
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    kscr[0] = ku_ref[0, rows - 1]
    kscr[1 : rows + 1] = kc_ref[0]
    kscr[rows + 1] = kd_ref[0, 0]
    vscr[0] = vu_ref[0, rows - 1]
    vscr[1 : rows + 1] = vc_ref[0]
    vscr[rows + 1] = vd_ref[0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    first_mask = lane < C
    last_mask = lane >= WC - C

    def all_shifted(full):
        """See the forward kernel: 5 shared rolls + masked selects."""
        r = {0: full}
        for s in (-2, -1, 1, 2):
            r[s] = pltpu.roll(full, shift=(s * C) % WC, axis=full.ndim - 1)
        out = []
        for ow in range(3):
            base = jnp.where(first_mask, r[-ow], r[1 - ow])
            out.append(jnp.where(last_mask, r[2 - ow], base))
        return out

    def shift_adjoint(t, ow):
        """Exact adjoint of the forward's clamped column shift."""
        a0 = pltpu.roll(
            jnp.where(first_mask, t, 0.0), shift=(ow * C) % WC, axis=t.ndim - 1
        )
        aN = pltpu.roll(
            jnp.where(last_mask, t, 0.0), shift=(-(2 - ow) * C) % WC, axis=t.ndim - 1
        )
        ai = pltpu.roll(
            jnp.where(first_mask | last_mask, 0.0, t),
            shift=(-(1 - ow) * C) % WC, axis=t.ndim - 1,
        )
        return a0 + aN + ai

    kf = kscr[:].astype(jnp.float32)
    vf = vscr[:].astype(jnp.float32)
    kws = all_shifted(kf)
    vws = all_shifted(vf)

    # base-2 softmax recompute (see the forward kernel): log2(e) is folded
    # into qs and the bias table, so the 18 transcendentals below are bare
    # exp2. The softmax VALUE a is base-invariant, and dl = a*(da - delta)
    # is the NATURAL-logit cotangent either way (the jacobian a(delta - a)
    # has no base factor), so dq (= dl * raw_k * scale) and dbias (= sum dl)
    # are untouched; only dk — accumulated as dl * qs with log2e folded into
    # qs — carries a stray log2e, cancelled by ln2 in nat_flat_bwd's final
    # dk cast.
    qs = q_ref[0].astype(jnp.float32) * (scale * 1.4426950408889634)
    g_full = g_ref[0].astype(jnp.float32)

    # fixup rows (image top/bottom) are excluded from the interior path by
    # zeroing their cotangent: dl == a*(da - delta) is then identically 0
    # there, so no spurious dq/dk/dv/dbias contributions flow.
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    fix_row = ((ib == 0) & (rid == 0)) | ((ib == nb - 1) & (rid == rows - 1))
    g_int = jnp.where(fix_row, 0.0, g_full)

    dkh_ref[0, 0] = jnp.zeros_like(dkh_ref[0, 0])
    dvh_ref[0, 0] = jnp.zeros_like(dvh_ref[0, 0])

    def backward(q_rows, g_rows, row_sl, ci, write_dq, write_halo, n):
        """Shared interior/fixup backward over ``n`` query rows.

        row_sl(a, oh): halo rows the queries see at vertical offset oh.
        write_dq(dq): store the dq rows.
        write_halo(oh, dk_rows, dv_rows): accumulate into the halo refs.
        """
        def logit(oh, ow):
            prod = q_rows * row_sl(kws[ow], oh)
            return _seg_sum_broadcast(prod, hd, C) + bias_ref[ci, oh * 3 + ow][None, :]

        # pass 1: running max
        m = logit(0, 0)
        for islot in range(1, 9):
            m = jnp.maximum(m, logit(islot // 3, islot % 3))
        # pass 2: den and softmax-jacobian dot  delta = sum_w a_w * da_w
        den = jnp.zeros_like(m)
        num = jnp.zeros_like(m)
        for islot in range(9):
            oh, ow = islot // 3, islot % 3
            e = jnp.exp2(logit(oh, ow) - m)
            den = den + e
            da = _seg_sum_broadcast(g_rows * row_sl(vws[ow], oh), hd, C)
            num = num + e * da
        inv = 1.0 / den
        delta = num * inv
        # pass 3: dq / dk / dv / dbias accumulation
        dq = jnp.zeros((n, q_rows.shape[-1]), jnp.float32)
        for islot in range(9):
            oh, ow = islot // 3, islot % 3
            a = jnp.exp2(logit(oh, ow) - m) * inv
            da = _seg_sum_broadcast(g_rows * row_sl(vws[ow], oh), hd, C)
            dl = a * (da - delta)
            dq = dq + dl * row_sl(kws[ow], oh)
            write_halo(oh, shift_adjoint(dl * q_rows, ow),
                       shift_adjoint(a * g_rows, ow))
            dbias_ref[ci, islot] += jnp.sum(dl, axis=0)
        write_dq(dq * scale)

    # interior rows: query row r sees halo rows r..r+2
    def wh_int(oh, dkr, dvr):
        dkh_ref[0, 0, oh : oh + rows] += dkr
        dvh_ref[0, 0, oh : oh + rows] += dvr

    backward(
        qs, g_int, lambda a, oh: a[oh : oh + rows], 1,
        lambda dq: dq_ref.__setitem__((0,), dq.astype(dq_ref.dtype)),
        wh_int, rows,
    )

    # image top row (stripe 0, row 0): halo rows 1..3, bias case 2
    @pl.when(ib == 0)
    def _():
        def wh(oh, dkr, dvr):
            dkh_ref[0, 0, 1 + oh : 2 + oh] += dkr
            dvh_ref[0, 0, 1 + oh : 2 + oh] += dvr

        backward(
            qs[0:1], g_full[0:1], lambda a, oh: a[1 + oh : 2 + oh], 2,
            lambda dq: dq_ref.__setitem__(
                (0, slice(0, 1)), dq.astype(dq_ref.dtype)
            ),
            wh, 1,
        )

    # image bottom row (last stripe, row rows-1): halo rows rows-2..rows, case 0
    @pl.when(ib == nb - 1)
    def _():
        def wh(oh, dkr, dvr):
            dkh_ref[0, 0, rows - 2 + oh : rows - 1 + oh] += dkr
            dvh_ref[0, 0, rows - 2 + oh : rows - 1 + oh] += dvr

        backward(
            qs[rows - 1 : rows], g_full[rows - 1 : rows],
            lambda a, oh: a[rows - 2 + oh : rows - 1 + oh], 0,
            lambda dq: dq_ref.__setitem__(
                (0, slice(rows - 1, rows)), dq.astype(dq_ref.dtype)
            ),
            wh, 1,
        )


def _combine_halo(dh: jnp.ndarray, H: int, rows: int) -> jnp.ndarray:
    """Fold per-stripe (rows+2)-row halo contributions into (B, H, WC):
    halo row 0 -> previous stripe's last row, halo row rows+1 -> next
    stripe's first row (the adjoint of the forward's up/center/down reads)."""
    B, nb, _, WC = dh.shape
    out = dh[:, :, 1 : rows + 1].reshape(B, H, WC)
    if nb > 1:
        up = dh[:, 1:, 0][:, :, None, :]  # -> stripe i-1, row rows-1
        out = out + jnp.pad(
            up, ((0, 0), (0, 1), (rows - 1, 0), (0, 0))
        ).reshape(B, H, WC)
        dn = dh[:, :-1, rows + 1][:, :, None, :]  # -> stripe i+1, row 0
        out = out + jnp.pad(
            dn, ((0, 0), (1, 0), (0, rows - 1), (0, 0))
        ).reshape(B, H, WC)
    return out


def _unflatten_dbias(dbias, heads: int, C: int, W: int) -> jnp.ndarray:
    """Adjoint of ``_bias_table_flat``: (3, 9, W*C) flat partials ->
    (heads, 5, 5) rpb gradient."""
    hd = C // heads
    # dl is segment-broadcast in the flat layout (the same per-(p,head)
    # scalar repeated across the hd lanes of its segment): average, not sum.
    d = dbias.reshape(3, 9, W, heads, hd).mean(-1)  # (3, 9, W, heads)
    drpb = jnp.zeros((heads, 5, 5), dbias.dtype)
    col_cases = [(2, d[:, :, 0:1]), (0, d[:, :, W - 1 : W]), (1, d[:, :, 1 : W - 1])]
    for ci in range(3):
        for oh in range(3):
            for ow in range(3):
                for cj, dslice in col_cases:
                    drpb = drpb.at[:, oh + ci, ow + cj].add(
                        dslice[ci, oh * 3 + ow].sum(0)
                    )
    return drpb


def _bwd_stripe_policy(H: int, WC: int) -> tuple[int, int | None]:
    """(stripe rows, vmem_limit_bytes|None) for the backward kernel.

    Under Mosaic's default 16 MB scoped-vmem limit the backward (softmax
    recompute + halo accumulators, ~2x the forward's live set) capped at
    8-row stripes (16-row overflowed at WC=3072 fp32: measured 16.43M)
    and had to route WC=6144 (512^2) through the XLA vjp entirely.  A
    per-kernel vmem_limit_bytes (cf. _stripe_policy) lifts both: measured
    on v5e (perf/nat_stripe_ab.py --bwd), rows=16@64M beats rows=8 at
    every stage and the fused 512^2 bwd beats the XLA vjp.

    Override for A/B: LMNET_NAT_BWD_STRIPE="rows,vmem_mb" ("0,..." =
    force the XLA-vjp fallback).
    """
    import os

    ov = os.environ.get("LMNET_NAT_BWD_STRIPE")
    if ov:
        r, mb = ov.split(",")
        return int(r), None if int(mb) == 16 else int(mb) * 2**20
    return 16, 64 * 2**20


def nat_flat_bwd(q, k, v, rpb, g, heads: int, C: int, W: int,
                 scale: float, interpret: bool = False):
    """Fused Pallas NAT backward. Returns (dq, dk, dv, drpb)."""
    B, H, WC = q.shape
    rows, vmem_limit = _bwd_stripe_policy(H, WC)
    while rows and H % rows:
        rows //= 2
    hd = C // heads
    # rows < 8 (H % 8 != 0): (1, rows, WC) blocks violate Mosaic's
    # second-minor-divisible-by-8 rule — use the XLA vjp like other
    # unsupported shapes (and rows=0 forces the fallback for A/B).
    if rows < 8 or H < 8 or W < 3 or (hd & (hd - 1)) or WC > 6144:
        _, vjp = jax.vjp(
            lambda q, k, v, rpb: _nat_flat_ref(q, k, v, rpb, heads, C, W, scale),
            q, k, v, rpb,
        )
        return vjp(g)
    nb = H // rows

    # base-2 softmax recompute (see _nat_flat_bwd_kernel)
    bias = _bias_table_flat(rpb, W, C) * 1.4426950408889634
    stripe = lambda im: pl.BlockSpec((1, rows, WC), im, memory_space=pltpu.VMEM)
    up = stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0))
    center = stripe(lambda b, i: (b, i, 0))
    down = stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0))
    halo_out = pl.BlockSpec(
        (1, 1, rows + 2, WC), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _nat_flat_bwd_kernel, rows=rows, C=C, W=W, heads=heads, scale=scale
    )
    dq, dkh, dvh, dbias = pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            center, center,
            up, center, down,
            up, center, down,
            pl.BlockSpec((3, 9, WC), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, WC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            halo_out,
            halo_out,
            pl.BlockSpec((3, 9, WC), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, WC), q.dtype),
            jax.ShapeDtypeStruct((B, nb, rows + 2, WC), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, rows + 2, WC), jnp.float32),
            jax.ShapeDtypeStruct((3, 9, WC), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows + 2, WC), q.dtype),
            pltpu.VMEM((rows + 2, WC), q.dtype),
        ],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
            if vmem_limit
            else None
        ),
    )(q, g, k, k, k, v, v, v, bias)
    # ln2 cancels the log2e folded into the kernel's qs (dk = dl * qs)
    dk = (_combine_halo(dkh, H, rows) * 0.6931471805599453).astype(k.dtype)
    dv = _combine_halo(dvh, H, rows).astype(v.dtype)
    drpb = _unflatten_dbias(dbias, heads, C, W).astype(rpb.dtype)
    return dq, dk, dv, drpb


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
    if scale is None:
        scale = float(C // heads) ** -0.5
    return nat_flat_bwd(q, k, v, rpb, g, heads, C, W, scale, interpret)


nat_flat.defvjp(_nat_flat_fwd, _nat_flat_bwd)
