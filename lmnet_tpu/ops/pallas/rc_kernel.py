"""Fused Pallas kernel for the deploy-mode ReparamConv block.

The deploy block (reference ``core/modules.py:586-600`` with the fused 5x5
depthwise kernel) is a chain of seven memory passes under XLA:

    e = hardswish(BN(expand_1x1(x)))
    t = gelu(dw5x5(e) + b)
    s = hardsigmoid(fc2(relu(fc1(mean_hw(t)))))      # squeeze-excitation
    y = pw_1x1(t * s) + shortcut_1x1(x)

This kernel runs it in TWO passes with recomputation (the SE global mean is
a hard synchronization point):

  phase 1: stream x row-stripes, compute t in VMEM, emit only the per-image
           channel sums (grid-accumulated into a (B, E) output);
  phase 2: tiny SE MLP on the host graph (jnp), then stream x again,
           recompute t, apply the SE scale, both 1x1 matmuls and the
           residual — one read of x per phase, one write of y. HBM traffic
           drops from ~8 passes to ~3 at the cost of recomputing the cheap
           expand/dw arithmetic.

Layout: channels-on-sublanes (C, W) orientation like the NAT kernel (C is
12..192); x is transposed once in HBM and shared by both phases.  The 5x5
depthwise convolution is 25 shifted multiply-adds over a (rows+4)-row halo
window assembled from clamp-indexed block stripes; image borders use true
zero padding (conv semantics), installed with @pl.when at the first/last
stripe.  BN is folded into the expand weights at trace time (inference
running stats — exactly the algebra of ops/reparam.py::fuse_bn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_w(x: jnp.ndarray, s: int, W: int) -> jnp.ndarray:
    """Zero-padded column shift on (..., W): out[.., j] = x[.., j - s].

    Static concat+slice (works for bf16; tpu.dynamic_rotate is 32-bit only).
    """
    if s == 0:
        return x
    zeros = jnp.zeros(x.shape[:-1] + (abs(s),), x.dtype)
    if s > 0:
        return jnp.concatenate([zeros, x[..., : W - s]], axis=-1)
    return jnp.concatenate([x[..., -s:], zeros], axis=-1)


def _expand_window(xu, xc, xd, we_ref, be_ref, rows, halo, ib, nb):
    """hardswish(We @ x + be) over the (rows + 2*halo)-row halo window.

    Returns a list of (E, W) arrays, one per window row; border halo rows
    are zeroed (true zero padding of the depthwise conv).
    """
    ew = []
    for t in range(rows + 2 * halo):
        if t < halo:
            xr = xu[0, rows - halo + t]
        elif t < rows + halo:
            xr = xc[0, t - halo]
        else:
            xr = xd[0, t - rows - halo]
        e = jnp.dot(
            we_ref[:].astype(xr.dtype), xr, preferred_element_type=jnp.float32
        ).astype(xr.dtype) + be_ref[:].reshape(-1, 1).astype(xr.dtype)
        ew.append(jax.nn.hard_swish(e))
    # zero halo rows at image borders
    zeroed = []
    for t, e in enumerate(ew):
        if t < halo:
            e = jnp.where(ib == 0, 0.0, e)
        if t >= rows + halo:
            e = jnp.where(ib == nb - 1, 0.0, e)
        zeroed.append(e)
    return zeroed


def _dw_gelu(ew, kdw_ref, bdw_ref, rows, W):
    """gelu(dw5x5(e) + b) for each of the `rows` output rows.

    ew: list of rows+4 (E, W) window rows. Returns list of rows (E, W).
    """
    out = []
    dt = ew[0].dtype
    for r in range(rows):
        acc = bdw_ref[:].reshape(-1, 1).astype(dt) * jnp.ones_like(ew[0])
        for a in range(5):
            row = ew[r + a]
            for b in range(5):
                tap = kdw_ref[a * 5 + b].reshape(-1, 1).astype(dt)
                acc = acc + tap * _shift_w(row, 2 - b, W)
        out.append(jax.nn.gelu(acc, approximate=True))
    return out


def _rc_phase1_kernel(
    xu, xc, xd, we_ref, be_ref, kdw_ref, bdw_ref, sums_ref,
    *, rows: int,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    W = xc.shape[3]

    @pl.when(ib == 0)
    def _():
        sums_ref[0, 0] = jnp.zeros_like(sums_ref[0, 0])

    ew = _expand_window(xu, xc, xd, we_ref, be_ref, rows, 2, ib, nb)
    ts = _dw_gelu(ew, kdw_ref, bdw_ref, rows, W)
    total = ts[0].astype(jnp.float32)
    for t in ts[1:]:
        total = total + t.astype(jnp.float32)
    sums_ref[0, 0] += jnp.sum(total, axis=1)  # (E,)


def _rc_phase2_kernel(
    xu, xc, xd, s_ref, we_ref, be_ref, kdw_ref, bdw_ref,
    wp_ref, bp_ref, wsc_ref, bsc_ref, o_ref,
    *, rows: int,
):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    W = xc.shape[3]

    ew = _expand_window(xu, xc, xd, we_ref, be_ref, rows, 2, ib, nb)
    ts = _dw_gelu(ew, kdw_ref, bdw_ref, rows, W)
    dt = xc.dtype
    scale = s_ref[0, 0].reshape(-1, 1).astype(dt)  # (E, 1)
    for r in range(rows):
        xr = xc[0, r]
        y = (
            jnp.dot(wp_ref[:].astype(dt), ts[r] * scale, preferred_element_type=jnp.float32)
            + bp_ref[:].reshape(-1, 1)
            + jnp.dot(wsc_ref[:].astype(dt), xr, preferred_element_type=jnp.float32)
            + bsc_ref[:].reshape(-1, 1)
        )
        o_ref[0, r] = y.astype(o_ref.dtype)


def fused_reparam_conv(
    x: jnp.ndarray,
    weights: dict,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a deploy-mode ReparamConv block through the fused kernels.

    Args:
      x: (B, H, W, C_in) NHWC input.
      weights: dict with keys (all jnp arrays):
        we (E, C_in) expand weights with BN folded, be (E,),
        kdw (25, E) depthwise taps row-major, bdw (E,),
        fc1_w (E//4, E), fc1_b (E//4,), fc2_w (E, E//4), fc2_b (E,),
        wp (C_out, E), bp (C_out,), wsc (C_out, C_in), bsc (C_out,).
    Returns (B, H, W, C_out).
    """
    B, H, W, Cin = x.shape
    E = weights["we"].shape[0]
    Cout = weights["wp"].shape[0]
    rows = 16
    while H % rows:
        rows //= 2
    if rows < 2 or H < 8 or W < 8:
        return _rc_xla(x, weights)  # maps too small to stripe
    nb = H // rows

    xT = x.transpose(0, 1, 3, 2)  # (B, H, C_in, W)
    f32 = jnp.float32
    we = weights["we"].astype(f32)
    be = weights["be"].astype(f32).reshape(1, E)
    kdw = weights["kdw"].astype(f32)
    bdw = weights["bdw"].astype(f32).reshape(1, E)
    wp = weights["wp"].astype(f32)
    bp = weights["bp"].astype(f32).reshape(1, Cout)
    wsc = weights["wsc"].astype(f32)
    bsc = weights["bsc"].astype(f32).reshape(1, Cout)

    stripe = lambda im: pl.BlockSpec((1, rows, Cin, W), im, memory_space=pltpu.VMEM)
    up = stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    center = stripe(lambda b, i: (b, i, 0, 0))
    down = stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    sums = pl.pallas_call(
        functools.partial(_rc_phase1_kernel, rows=rows),
        grid=(B, nb),
        interpret=interpret,
        in_specs=[up, center, down, full(we.shape), full(be.shape),
                  full(kdw.shape), full(bdw.shape)],
        out_specs=pl.BlockSpec((1, 1, E), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, E), f32),
    )(xT, xT, xT, we, be, kdw, bdw)

    mean = sums[:, 0] / (H * W)
    h = jax.nn.relu(mean @ weights["fc1_w"].astype(f32).T + weights["fc1_b"].astype(f32))
    s = jax.nn.hard_sigmoid(h @ weights["fc2_w"].astype(f32).T + weights["fc2_b"].astype(f32))

    out = pl.pallas_call(
        functools.partial(_rc_phase2_kernel, rows=rows),
        grid=(B, nb),
        interpret=interpret,
        in_specs=[up, center, down,
                  pl.BlockSpec((1, 1, E), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                  full(we.shape), full(be.shape), full(kdw.shape), full(bdw.shape),
                  full(wp.shape), full(bp.shape), full(wsc.shape), full(bsc.shape)],
        out_specs=pl.BlockSpec(
            (1, rows, Cout, W), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout, W), x.dtype),
    )(xT, xT, xT, s[:, None, :].astype(f32), we, be, kdw, bdw, wp, bp, wsc, bsc)
    return out.transpose(0, 1, 3, 2)


def _rc_xla(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """Pure-XLA reference of the fused block (fallback for tiny maps,
    and the oracle for kernel tests)."""
    f32 = jnp.float32
    e = jax.nn.hard_swish(
        jnp.einsum("bhwc,ec->bhwe", x.astype(f32), w["we"].astype(f32))
        + w["be"].astype(f32)
    )
    E = e.shape[-1]
    kd = w["kdw"].astype(f32).reshape(5, 5, E).transpose(0, 1, 2)[:, :, None, :]
    kd = kd.reshape(5, 5, 1, E)
    t = jax.lax.conv_general_dilated(
        e, kd, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=E,
    ) + w["bdw"].astype(f32)
    t = jax.nn.gelu(t, approximate=True)
    m = jnp.mean(t, axis=(1, 2))
    h = jax.nn.relu(m @ w["fc1_w"].astype(f32).T + w["fc1_b"].astype(f32))
    s = jax.nn.hard_sigmoid(h @ w["fc2_w"].astype(f32).T + w["fc2_b"].astype(f32))
    t = t * s[:, None, None, :]
    y = (
        jnp.einsum("bhwe,oe->bhwo", t, w["wp"].astype(f32)) + w["bp"].astype(f32)
        + jnp.einsum("bhwc,oc->bhwo", x.astype(f32), w["wsc"].astype(f32))
        + w["bsc"].astype(f32)
    )
    return y.astype(x.dtype)


def fold_rc_weights(p: dict, stats: dict, eps: float = 1e-5) -> dict:
    """Fold a deploy-mode ReparamConv param subtree into kernel weights.

    ``p``/``stats``: the block's entries from variables['params'] /
    variables['batch_stats'] (expand_conv, expand_bn, fuse_conv, se,
    pointwise_conv, shortcut — see models/blocks.py::ReparamConv).
    """
    we_k = p["expand_conv"]["conv"]["kernel"][0, 0]  # (C_in, E)
    we_b = p["expand_conv"]["conv"]["bias"]
    bn = p["expand_bn"]
    st = stats["expand_bn"]
    inv = bn["scale"] / jnp.sqrt(st["var"] + eps)
    we = (we_k * inv[None, :]).T  # (E, C_in)
    be = (we_b - st["mean"]) * inv + bn["bias"]

    kdw_hw = p["fuse_conv"]["conv"]["kernel"]  # (5, 5, 1, E)
    kdw = kdw_hw[:, :, 0, :].reshape(25, -1)  # (25, E) row-major taps
    bdw = p["fuse_conv"]["conv"]["bias"]

    return dict(
        we=we,
        be=be,
        kdw=kdw,
        bdw=bdw,
        fc1_w=p["se"]["fc1"]["kernel"][0, 0].T,  # (E//4, E)
        fc1_b=p["se"]["fc1"]["bias"],
        fc2_w=p["se"]["fc2"]["kernel"][0, 0].T,  # (E, E//4)
        fc2_b=p["se"]["fc2"]["bias"],
        wp=p["pointwise_conv"]["conv"]["kernel"][0, 0].T,  # (C_out, E)
        bp=p["pointwise_conv"]["conv"]["bias"],
        wsc=p["shortcut"]["conv"]["kernel"][0, 0].T,  # (C_out, C_in)
        bsc=p["shortcut"]["conv"]["bias"],
    )
