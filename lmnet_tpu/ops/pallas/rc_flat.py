"""Flat-layout fused depthwise-5x5 + bias + GELU (+ channel sums) kernel.

MEASURED NEGATIVE RESULT — selectable via ``rc_backend='flat'`` in
``serve.deploy_forward`` but NOT the default: e2e serving at 256^2 B=128
is 705 img/s vs 1321 with the plain-XLA deploy block (perf/rc_backend_ab.py).
Same root cause as the train-mode rc_train kernel: the 25-tap roll-ladder
does one shifted VPU multiply-add per tap, while XLA lowers the same
depthwise conv at ~73% of the VPU roofline and fuses the surrounding
elementwise ops well enough that the "no standalone passes" structure below
never pays for the slower conv.  Kept wired + tested as the honest record.

The deploy-mode ReparamConv hot path (reference ``core/modules.py:586-600``
after ``switch_to_deploy``) is ``pointwise(SE(gelu(dw5x5(e) + b)))``.  On TPU
the dw conv + elementwise passes LOOKED dominant: LM-Net's channel counts
(12..192) sit on the 128-wide lane dimension and waste up to 10x of every
vector register and every XLA fusion (measured: bare dw5x5 4.6 ms + bare
gelu 2.8 ms at B=64, 256^2 x 24 — ~5x off the VPU roofline; the e2e loss
above shows those bare-op numbers carried RTT/layout context that the real
graph does not pay).

The design is a layout observation: LM-Net halves W as it doubles C, so
``W*C == 6144`` at every stage.  Viewing activations as ``(B, H, W*C)``
(a free reshape — identical HBM bytes) puts a fully dense 6144-wide vector
on the lanes at every stage, and the depthwise conv becomes 25 shifted
fused multiply-adds where

  * H-shifts are neighbor rows (halo-assembled stripes, like the NAT
    kernel),
  * W-shifts are lane rotations by ``C`` (``pltpu.roll``), with the
    zero-padding at the W border folded INTO the 25 weight vectors
    (weight[j] = 0 wherever pixel j's shifted source is out of bounds —
    (shifted * w) * mask == shifted * (w * mask)),
  * the per-channel kernel taps k[c, dh, dw] are pre-tiled to flat
    ``(25, W*C)`` weight vectors.

GELU (tanh) and the bias add are fused in, and the kernel also emits the
per-image flat channel sums of the activated output so the caller can
compute the SE squeeze WITHOUT re-reading t from HBM; the SE scale is then
absorbed into the pointwise matmul weights (diag(s) @ W_pw), making the
whole deploy block: [XLA matmul] -> [this kernel] -> [XLA matmul]. No
standalone elementwise passes, no relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_weights(kernel: jnp.ndarray, W: int) -> jnp.ndarray:
    """(kh, kw, 1, C) HWIO depthwise kernel (flax Conv, groups=C) ->
    (kh*kw, W*C) flat weight vectors with the W-border zero padding folded
    in."""
    kh, kw, one, C = kernel.shape
    assert one == 1, f"expected depthwise HWIO kernel, got {kernel.shape}"
    w_idx = np.repeat(np.arange(W), C)  # pixel index of each flat position
    rows = []
    for dh in range(kh):
        for dw in range(kw):
            tap = jnp.tile(kernel[dh, dw, 0, :], W)  # (W*C,)
            src = w_idx + dw - (kw // 2)
            valid = jnp.asarray((src >= 0) & (src < W), tap.dtype)
            rows.append(tap * valid)
    return jnp.stack(rows, 0)  # (kh*kw, W*C)


def _dw_kernel(eu_ref, ec_ref, ed_ref, w_ref, b_ref, o_ref, s_ref, hscr,
               *, rows: int, C: int, kh: int, kw: int,
               acc_dtype=jnp.float32):
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = ec_ref.shape[2]
    pad = kh // 2

    # halo assembly: rows ib*rows-pad .. ib*rows+rows+pad-1
    hscr[0:pad] = eu_ref[0, rows - pad : rows]
    hscr[pad : rows + pad] = ec_ref[0]
    hscr[rows + pad : rows + 2 * pad] = ed_ref[0, 0:pad]

    @pl.when(ib == 0)
    def _():
        hscr[0:pad] = jnp.zeros((pad, WC), hscr.dtype)

    @pl.when(ib == nb - 1)
    def _():
        hscr[rows + pad : rows + 2 * pad] = jnp.zeros((pad, WC), hscr.dtype)

    # roll ONCE per dw over the whole halo block (kw rolls total, measured
    # ~free vs 25), then row-sliced fmas per dh
    acc = jnp.broadcast_to(b_ref[:].astype(acc_dtype), (rows, WC))
    full = hscr[:].astype(acc_dtype)  # (rows + 2*pad, WC)
    for dw in range(kw):
        shift = ((pad - dw) * C) % WC
        sh = pltpu.roll(full, shift=shift, axis=1) if shift else full
        for dh in range(kh):
            acc = acc + sh[dh : dh + rows] * w_ref[dh * kw + dw][None, :]
    t = jax.nn.gelu(acc, approximate=True)
    o_ref[0] = t.astype(o_ref.dtype)

    # flat channel sums (fold W outside the kernel): accumulate across the
    # sequential H-stripe grid steps into the per-image (1, WC) output block
    part = jnp.sum(t, axis=0, keepdims=True).astype(s_ref.dtype)  # (1, WC)

    @pl.when(ib == 0)
    def _():
        s_ref[0] = part

    @pl.when(ib > 0)
    def _():
        s_ref[0] = s_ref[0] + part


@functools.partial(jax.jit, static_argnames=("C", "interpret"))
def dw_gelu_flat(e_flat: jnp.ndarray, wflat: jnp.ndarray, bflat: jnp.ndarray,
                 C: int, interpret: bool = False):
    """t = gelu(dw5x5(e) + b) on flat (B, H, W*C) layout, plus flat channel
    sums (B, W*C) of t (reshape to (B, W, C) and sum axis 1 for the SE
    squeeze).

    Args:
      e_flat: (B, H, W*C) — a reshaped NHWC activation.
      wflat: (kh*kw, W*C) from ``_flat_weights``.
      bflat: (W*C,) tiled depthwise bias.
      C: channel count (for the lane-rotation stride).
    """
    B, H, WC = e_flat.shape
    taps = wflat.shape[0]
    kh = kw = int(round(taps**0.5))
    pad = kh // 2

    # rows=16: 32-row stripes exceed the 16 MB scoped-vmem limit at WC=6144
    # once the kernel sits inside the full train graph (measured 16.50M)
    rows = min(16, H)
    while H % rows:
        rows //= 2
    assert rows >= pad, f"H={H} too small for stripe halo"
    nb = H // rows

    stripe = lambda im: pl.BlockSpec((1, rows, WC), im, memory_space=pltpu.VMEM)
    # accumulate in the weight dtype (fp32 default; bf16 wflat selects
    # bf16-native VPU arithmetic — a perf probe knob, see perf/focus2.py)
    kernel = functools.partial(
        _dw_kernel, rows=rows, C=C, kh=kh, kw=kw, acc_dtype=wflat.dtype
    )
    out, sums = pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            stripe(lambda b, i: (b, jnp.maximum(i - 1, 0), 0)),
            stripe(lambda b, i: (b, i, 0)),
            stripe(lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0)),
            pl.BlockSpec((taps, WC), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WC), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, WC), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WC), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, WC), e_flat.dtype),
            jax.ShapeDtypeStruct((B, 1, WC), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows + 2 * pad, WC), e_flat.dtype)],
    )(e_flat, e_flat, e_flat, wflat, bflat.reshape(1, WC))
    return out, sums[:, 0]


def fused_rc_block(x: jnp.ndarray, fw: dict, interpret: bool = False):
    """Deploy-mode ReparamConv block via the flat dw kernel.

    x: (B, H, W, Cin) NHWC. ``fw``: folded weights from
    ``fold_rc_flat_weights``. Returns (B, H, W, Cout).

    Structure: XLA matmul (expand+BN+hardswish) -> flat Pallas
    [dw5x5+bias+gelu+sums] -> SE squeeze on the (B, C) sums -> one XLA
    einsum with the SE scale absorbed into the pointwise weights, plus the
    shortcut matmul. Matches blocks.ReparamConv(deploy=True) numerics.
    """
    B, H, W, Cin = x.shape
    C = fw["we"].shape[1]
    # expand 1x1 + folded BN affine + hardswish (one XLA fusion, MXU matmul)
    e = jax.nn.hard_swish(
        jnp.einsum("bhwc,cd->bhwd", x, fw["we"].astype(x.dtype))
        + fw["be"].astype(x.dtype)
    )
    t_flat, sums = dw_gelu_flat(
        e.reshape(B, H, W * C), fw["wflat"], fw["bflat"], C, interpret=interpret
    )
    # SE squeeze from the kernel's channel sums — t never re-read for this
    mean = sums.reshape(B, W, C).sum(axis=1) / (H * W)  # (B, C)
    h = jax.nn.relu(mean @ fw["w1"] + fw["b1"])
    s = jax.nn.hard_sigmoid(h @ fw["w2"] + fw["b2"])  # (B, C)
    # SE scale as a broadcast multiply fused by XLA into the pointwise
    # matmul's operand read (NO (B,HW,C) reshape — that relayouts — and NO
    # batched einsum — both measured 2-4ms slower at B=64 256^2)
    t = t_flat.reshape(B, H, W, C) * s[:, None, None, :].astype(x.dtype)
    out = (
        jnp.einsum("bhwc,cd->bhwd", t, fw["wpw"].astype(x.dtype))
        + fw["bpw"].astype(x.dtype)
        + jnp.einsum("bhwc,cd->bhwd", x, fw["wsc"].astype(x.dtype))
        + fw["bsc"].astype(x.dtype)
    )
    return out


def fold_rc_flat_weights(p: dict, s: dict, W: int) -> dict:
    """Fold a deploy-mode ReparamConv param subtree (post structural_reparam)
    into the flat-kernel weight set. All folding is trace-time-constant.

    p/s: the block's params / batch_stats subtrees (expand_conv, expand_bn,
    fuse_conv, se, pointwise_conv, shortcut).
    """
    eps = 1e-5
    we = p["expand_conv"]["conv"]["kernel"][0, 0]  # (Cin, C)
    be = p["expand_conv"]["conv"]["bias"]
    inv = p["expand_bn"]["scale"] / jnp.sqrt(s["expand_bn"]["var"] + eps)
    we = we * inv[None, :]
    be = (be - s["expand_bn"]["mean"]) * inv + p["expand_bn"]["bias"]
    kd = p["fuse_conv"]["conv"]["kernel"]  # (5, 5, C, 1) HWIO depthwise
    bd = p["fuse_conv"]["conv"]["bias"]
    return dict(
        we=we,
        be=be,
        wflat=_flat_weights(kd.astype(jnp.float32), W),
        bflat=jnp.tile(bd.astype(jnp.float32), W),
        w1=p["se"]["fc1"]["kernel"][0, 0],
        b1=p["se"]["fc1"]["bias"],
        w2=p["se"]["fc2"]["kernel"][0, 0],
        b2=p["se"]["fc2"]["bias"],
        wpw=p["pointwise_conv"]["conv"]["kernel"][0, 0],
        bpw=p["pointwise_conv"]["conv"]["bias"],
        wsc=p["shortcut"]["conv"]["kernel"][0, 0],
        bsc=p["shortcut"]["conv"]["bias"],
    )
