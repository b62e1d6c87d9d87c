"""Serving engine: the LM-Net deploy forward as a pure function over raw
variables, with every ReparamConv block running through the fused two-phase
Pallas kernel (``ops/pallas/rc_kernel.py``) and NAT through the fused NAT
kernel.

This is the inference path for production deployment: take the training
checkpoint, ``structural_reparam`` it, and call ``deploy_forward`` — no Flax
module interpretation, maximal kernel fusion.  Equivalence with
``LMNet(deploy=True).apply`` is pinned by tests/test_serve.py.

Graph parity: reference ``core/LM_Net.py:95-123`` (see models/lm_net.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lmnet_tpu.models.blocks import gelu
from lmnet_tpu.ops.nat import neighborhood_attention
from lmnet_tpu.ops.pallas.nat_kernel import neighborhood_attention_pallas
from lmnet_tpu.ops.pallas.rc_kernel import fold_rc_weights, fused_reparam_conv
from lmnet_tpu.ops.resize import adaptive_avg_pool, upsample2x_align_corners

BN_EPS = 1e-5
LN_EPS = 1e-5


def _conv(p, x, stride: int = 1):
    """NHWC conv from a TorchConv param subtree (torch k//2 padding)."""
    k = p["conv"]["kernel"]
    kh, kw = k.shape[0], k.shape[1]
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["conv"]["bias"].astype(x.dtype)


def _bn(p, s, x):
    inv = p["scale"] / jnp.sqrt(s["var"] + BN_EPS)
    return x * inv.astype(x.dtype) + (p["bias"] - s["mean"] * inv).astype(x.dtype)


def _ln(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _dense(p, x):
    return x @ p["dense"]["kernel"].astype(x.dtype) + p["dense"]["bias"].astype(x.dtype)


def _mlp(p, x):
    # NOTE slicing the hidden into halves (no fused (.., 2C) intermediate)
    # measured 16 ms SLOWER e2e at B=128 — the fused fc1+gelu fusion wins
    return _dense(p["fc2"], gelu(_dense(p["fc1"], x)))


def _conv_parts(p, parts):
    """conv(concat(parts)) as a sum of input-channel-sliced convs — the
    concatenated tensor is never materialized (a real copy on TPU)."""
    k = p["conv"]["kernel"]
    kh, kw = k.shape[0], k.shape[1]
    out = None
    c0 = 0
    for part in parts:
        c1 = c0 + part.shape[-1]
        o = jax.lax.conv_general_dilated(
            part, k[:, :, c0:c1, :].astype(part.dtype), (1, 1),
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = o if out is None else out + o
        c0 = c1
    return out + p["conv"]["bias"].astype(out.dtype)


def _compose_kk(k1, b1, k2):
    """Compose two stacked 'same'-padded convs into one (k1 then k2):
    K[d] = sum_{d1+d2=d} k2[d2] @ k1[d1] over the channel contraction,
    bias1 folded through k2. HWIO kernels. Exact in the interior; the
    outermost output ring differs from the two-pass form (the two-pass
    zero-pads the INTERMEDIATE, which the composition cannot see) —
    callers must bound/accept that 1-px deviation.
    Returns (K (kh1+kh2-1, ...), b1_through: (O,) bias contribution)."""
    kh1, kw1, ci, cm = k1.shape
    kh2, kw2, cm2, co = k2.shape
    assert cm == cm2, (cm, cm2)
    K = jnp.zeros((kh1 + kh2 - 1, kw1 + kw2 - 1, ci, co), jnp.float32)
    k1f = k1.astype(jnp.float32)
    k2f = k2.astype(jnp.float32)
    for a in range(kh1):
        for b in range(kw1):
            # k1[a,b] : (ci, cm); k2 window shifted by (a, b)
            K = K.at[a : a + kh2, b : b + kw2].add(
                jnp.einsum("im,hwmo->hwio", k1f[a, b], k2f)
            )
    b_through = jnp.einsum("m,hwmo->o", b1.astype(jnp.float32), k2f)
    return K, b_through


def _conv_k(x, k, bias, stride=1):
    kh, kw = k.shape[0], k.shape[1]
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(x.dtype)


def _m2skip_composed(p, s, xl, xs, mode):
    """M2 skip with convl/convs COMPOSED into the fuse conv (two 3x3 ->
    one 5x5 per input): the (B,H,W,cm) intermediates a and b are never
    materialized. Interior-exact; 1-px border ring deviates (see
    _compose_kk). Prototype for the skips-bucket HBM headroom
    (VERDICT r4 ask #4b)."""
    kf = p["fuse_conv"]["conv"]["kernel"]
    cm = p["convl"]["conv"]["kernel"].shape[-1]
    ks, bs = _compose_kk(
        p["convs"]["conv"]["kernel"], p["convs"]["conv"]["bias"], kf[:, :, cm:, :]
    )
    zero = jnp.zeros((kf.shape[-1],), jnp.float32)
    if mode == "bottom":
        # convl has stride 2: composition across a strided conv is not a
        # plain conv — keep the two-pass form for the strided input (its
        # bias rides inside `a`, so it is NOT folded again here)
        a = _conv(p["convl"], xl, 2)
        out = _conv_k(a, kf[:, :, :cm, :], zero) + _conv_k(
            xs, ks, bs + p["fuse_conv"]["conv"]["bias"].astype(jnp.float32)
        )
    else:
        kl, bl = _compose_kk(
            p["convl"]["conv"]["kernel"], p["convl"]["conv"]["bias"],
            kf[:, :, :cm, :],
        )
        out = _conv_k(
            xl, kl, bl + bs + p["fuse_conv"]["conv"]["bias"].astype(jnp.float32)
        ) + _conv_k(upsample2x_align_corners(xs), ks, zero)
    return gelu(_bn(p["fuse_bn"], s["fuse_bn"], out))


def _m3skip_composed(p, s, xl, xm, xs):
    kf = p["fuse_conv"]["conv"]["kernel"]
    cm = p["convm"]["conv"]["kernel"].shape[-1]
    km, bm = _compose_kk(
        p["convm"]["conv"]["kernel"], p["convm"]["conv"]["bias"],
        kf[:, :, cm : 2 * cm, :],
    )
    ks, bs = _compose_kk(
        p["convs"]["conv"]["kernel"], p["convs"]["conv"]["bias"],
        kf[:, :, 2 * cm :, :],
    )
    a = _conv(p["convl"], xl, 2)  # strided: not composable
    bias = bm + bs + p["fuse_conv"]["conv"]["bias"].astype(jnp.float32)
    out = (
        _conv_k(a, kf[:, :, :cm, :], jnp.zeros((kf.shape[-1],), jnp.float32))
        + _conv_k(xm, km, bias)
        + _conv_k(
            upsample2x_align_corners(xs), ks,
            jnp.zeros((kf.shape[-1],), jnp.float32),
        )
    )
    return gelu(_bn(p["fuse_bn"], s["fuse_bn"], out))


def _m2skip(p, s, xl, xs, mode):
    if mode == "bottom":
        a = _conv(p["convl"], xl, 2)
        b = _conv(p["convs"], xs)
    else:
        a = _conv(p["convl"], xl)
        b = _conv(p["convs"], upsample2x_align_corners(xs))
    return gelu(_bn(p["fuse_bn"], s["fuse_bn"], _conv_parts(p["fuse_conv"], [a, b])))


def _m3skip(p, s, xl, xm, xs):
    a = _conv(p["convl"], xl, 2)
    b = _conv(p["convm"], xm)
    c = _conv(p["convs"], upsample2x_align_corners(xs))
    return gelu(
        _bn(p["fuse_bn"], s["fuse_bn"], _conv_parts(p["fuse_conv"], [a, b, c]))
    )


def _global_attention(p, x, num_heads):
    B, N, C = x.shape
    qkv = x @ p["qkv"]["kernel"].astype(x.dtype) + p["qkv"]["bias"].astype(x.dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q * (C // num_heads) ** -0.5, k), axis=-1
    )
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
    return out @ p["proj"]["kernel"].astype(x.dtype) + p["proj"]["bias"].astype(x.dtype)


def _gft(p, x, num_heads):
    B, H, W, C = x.shape
    emb = _conv(p["embed"]["proj"], x).reshape(B, H * W, -1)
    att = _global_attention(p["attn"], _ln(p["norm1"], emb), num_heads) + emb
    out = _mlp(p["mlp"], _ln(p["norm2"], att)) + att
    return _conv(p["out_conv"], out.reshape(B, H, W, -1))


def _ln_static_scale(p):
    """Static bound on |LN output| (no data pass): the normalized vector
    has L2 norm sqrt(C) so per-element |x_hat| <= sqrt(C-1); scale by
    gamma's absmax, shift by beta's."""
    c = p["scale"].shape[0]
    bound = float(max(c - 1, 1)) ** 0.5 * jnp.max(jnp.abs(p["scale"])) + jnp.max(
        jnp.abs(p["bias"])
    )
    return jnp.maximum(bound, 1e-8) / 127.0


def _ln_q8(p, x, s_in):
    """LayerNorm emitting int8 at the static scale — the quantize is
    elementwise, so XLA fuses it into the LN chain and the MATERIALIZED
    tensor is int8 (half the HBM bytes of bf16; that, not MXU rate, is
    the win: these interiors are bandwidth-bound)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["scale"] + p["bias"]
    return jnp.round(y / s_in).clip(-127, 127).astype(jnp.int8)


def _quant_w_percol(w):
    """Per-output-column symmetric int8 weight quantization (trace-cheap)."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-8)
    w8 = jnp.round(w / s[None, :]).clip(-127, 127).astype(jnp.int8)
    return w8, s


def _dense_i8(x8, w8, s_in, s_col, bias, out_dtype):
    acc = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (s_in * s_col) + bias).astype(out_dtype)


def _ln_fold(p_ln, w, b):
    """Fold the LN affine (gamma, beta) into a downstream dense (w, b):
    (x_hat*gamma + beta) @ w + b == x_hat @ (gamma[:,None]*w) + (beta@w + b).
    Pure weight math — exact; pairs with a no-affine normalize."""
    g = p_ln["scale"].astype(jnp.float32)
    be = p_ln["bias"].astype(jnp.float32)
    wf = w.astype(jnp.float32)
    return g[:, None] * wf, be @ wf + b.astype(jnp.float32)


def _ln_noaffine(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS)


def _natt(p, x, num_heads, nat_backend, int8_interior: bool = False,
          ln_fold: bool = False):
    # NOTE a fully fused flat-block kernel exists (ops/pallas/natt_flat.py)
    # but measured 2x SLOWER than this unfused path (55.7 vs 28.1 ms for
    # natt4 at B=128): in-kernel C-mixing needs O(C) cross-lane rolls,
    # and VPU lane rotations cost ~2x a plain vector op. Kept unwired as a
    # documented negative result; C-mixing belongs on the MXU.
    emb = _conv(p["embed"]["proj"], x)
    C = emb.shape[-1]
    if int8_interior:
        # int8 qkv dots off a static-scale int8 LN output (measured +6.9%
        # on natt4 / +4.0% on natt3 at B=128; ~1-2% mean activation error —
        # see BASELINE.md). proj/fc2 stay bf16: their inputs (NAT output,
        # gelu output) have no static bound and a dynamic amax costs the
        # extra HBM pass the scheme saves.
        s1 = _ln_static_scale(p["norm1"])
        ln1_8 = _ln_q8(p["norm1"], emb, s1)
        wq8, sq = _quant_w_percol(p["attn"]["qkv"]["dense"]["kernel"])
        bq = p["attn"]["qkv"]["dense"]["bias"]
        q = _dense_i8(ln1_8, wq8[:, :C], s1, sq[:C], bq[:C], emb.dtype)
        k = _dense_i8(
            ln1_8, wq8[:, C : 2 * C], s1, sq[C : 2 * C], bq[C : 2 * C], emb.dtype
        )
        v = _dense_i8(ln1_8, wq8[:, 2 * C :], s1, sq[2 * C :], bq[2 * C :], emb.dtype)
    elif ln_fold:
        # LN-affine folded into the qkv weights (deploy-time weight math;
        # VERDICT r4 ask #4a): normalize without affine, matmul with
        # gamma-scaled kernels + beta-shifted bias. Exact.
        ln1 = _ln_noaffine(emb)
        wqf, bqf = _ln_fold(
            p["norm1"], p["attn"]["qkv"]["dense"]["kernel"],
            p["attn"]["qkv"]["dense"]["bias"],
        )
        wq = wqf.astype(ln1.dtype)
        bq = bqf.astype(ln1.dtype)
        q = ln1 @ wq[:, :C] + bq[:C]
        k = ln1 @ wq[:, C : 2 * C] + bq[C : 2 * C]
        v = ln1 @ wq[:, 2 * C :] + bq[2 * C :]
    else:
        ln1 = _ln(p["norm1"], emb)
        # weight-sliced qkv: splitting the fused (.., 3C) output costs real
        # copies on TPU; per-slice matmuls fuse into the flat reshape for free
        wq = p["attn"]["qkv"]["dense"]["kernel"].astype(ln1.dtype)
        bq = p["attn"]["qkv"]["dense"]["bias"].astype(ln1.dtype)
        q = ln1 @ wq[:, :C] + bq[:C]
        k = ln1 @ wq[:, C : 2 * C] + bq[C : 2 * C]
        v = ln1 @ wq[:, 2 * C :] + bq[2 * C :]
    rpb = p["attn"]["rpb"]
    if nat_backend == "flat":
        from lmnet_tpu.ops.pallas.nat_flat import nat_flat

        B, H, W, C = q.shape
        nat = nat_flat(
            q.reshape(B, H, W * C), k.reshape(B, H, W * C),
            v.reshape(B, H, W * C), rpb, num_heads, C, W,
        ).reshape(B, H, W, C)
    elif nat_backend == "pallas":
        nat = neighborhood_attention_pallas(q, k, v, rpb, 3)
    else:
        nat = neighborhood_attention(q, k, v, rpb, 3)
    att = _dense(p["attn"]["proj"], nat) + emb
    if int8_interior:
        s2 = _ln_static_scale(p["norm2"])
        ln2_8 = _ln_q8(p["norm2"], att, s2)
        w18, sc1 = _quant_w_percol(p["mlp"]["fc1"]["dense"]["kernel"])
        h = gelu(
            _dense_i8(ln2_8, w18, s2, sc1, p["mlp"]["fc1"]["dense"]["bias"], att.dtype)
        )
        return _dense(p["mlp"]["fc2"], h) + att
    if ln_fold:
        w1f, b1f = _ln_fold(
            p["norm2"], p["mlp"]["fc1"]["dense"]["kernel"],
            p["mlp"]["fc1"]["dense"]["bias"],
        )
        ln2 = _ln_noaffine(att)
        h = gelu(ln2 @ w1f.astype(ln2.dtype) + b1f.astype(ln2.dtype))
        return _dense(p["mlp"]["fc2"], h) + att
    return _mlp(p["mlp"], _ln(p["norm2"], att)) + att


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "nat_backend", "rc_backend", "interpret", "natt_int8",
        "ln_fold", "skip_compose",
    ),
)
def deploy_forward(
    variables: dict,
    x: jnp.ndarray,
    num_heads: int = 12,
    # 'flat' (fused flat-layout kernel, no transposes) | 'xla' | 'pallas',
    # or a 4-tuple giving the backend per NAT stage (natt1..natt4 =
    # deepest 32^2 C=192//2 .. shallowest 256^2 C=12 at 256^2 inputs)
    nat_backend: str | tuple = "flat",
    rc_backend: str = "xla",  # 'flat' (rc_flat fused dw+gelu+SE-sums) | 'pallas' (two-phase) | 'xla'
    interpret: bool = False,  # Pallas interpreter mode (CPU testing)
    natt_int8: bool = False,  # int8 NATT interiors (+~2% e2e, ~1-2% act error)
    ln_fold: bool = False,  # fold LN affine into qkv/fc1 weights (exact)
    # compose convl/convm/convs into the fuse conv in the skip blocks
    # (interior-exact; 1-px border ring deviates — see _compose_kk)
    skip_compose: bool = False,
):
    """Fused deploy-mode forward. ``variables`` = structural_reparam output."""
    p = variables["params"]
    s = variables["batch_stats"]

    def rc(name, h):
        if rc_backend == "flat":
            from lmnet_tpu.ops.pallas.rc_flat import (
                fold_rc_flat_weights,
                fused_rc_block,
            )

            fw = fold_rc_flat_weights(p[name], s[name], h.shape[2])
            return fused_rc_block(h, fw, interpret=interpret).astype(h.dtype)
        if rc_backend == "pallas":
            return fused_reparam_conv(
                h, fold_rc_weights(p[name], s[name]), interpret=interpret
            ).astype(h.dtype)
        # xla fallback mirrors models/blocks.py::ReparamConv deploy math
        blk, bst = p[name], s[name]
        e = jax.nn.hard_swish(
            _bn(blk["expand_bn"], bst["expand_bn"], _conv(blk["expand_conv"], h))
        )
        kd = blk["fuse_conv"]["conv"]["kernel"]
        t = jax.lax.conv_general_dilated(
            e, kd.astype(e.dtype), (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=e.shape[-1],
        ) + blk["fuse_conv"]["conv"]["bias"].astype(e.dtype)
        t = gelu(t)
        se = blk["se"]  # SE fc1/fc2 are plain nn.Conv 1x1 (kernel (1,1,Cin,Cout))
        # keep the compute dtype: raw f32 SE weights would promote t — and
        # every downstream block — to f32 (2.4x slower serve, VMEM OOM in
        # the f32 NAT kernel; found via jaxpr dtype audit)
        m = jnp.mean(t, axis=(1, 2), keepdims=True)
        m = jax.nn.relu(
            m @ se["fc1"]["kernel"][0, 0].astype(m.dtype)
            + se["fc1"]["bias"].astype(m.dtype)
        )
        sc = jax.nn.hard_sigmoid(
            m @ se["fc2"]["kernel"][0, 0].astype(m.dtype)
            + se["fc2"]["bias"].astype(m.dtype)
        )
        t = t * sc
        return _conv(blk["pointwise_conv"], t) + _conv(blk["shortcut"], h)

    x1 = rc("conv1_1", rc("conv1_0", x))
    xd1 = _conv(p["down1"], x1, 2)
    x2 = rc("conv2_1", rc("conv2_0", xd1))
    xd2 = _conv(p["down2"], x2, 2)
    x3 = rc("conv3_1", rc("conv3_0", xd2))
    xd3 = _conv(p["down3"], x3, 2)
    x4 = rc("conv4_1", rc("conv4_0", xd3))
    xd4 = _conv(p["down4"], x4, 2)

    h, w = xd4.shape[1], xd4.shape[2]
    pooled = jnp.concatenate(
        [adaptive_avg_pool(t, (h, w)) for t in (x1, x2, x3, x4)] + [xd4], axis=-1
    )
    x5 = _gft(p["gft"], pooled, num_heads)

    m2, m3 = (
        (_m2skip_composed, _m3skip_composed) if skip_compose else (_m2skip, _m3skip)
    )
    s1 = m2(p["skip1"], s["skip1"], x3, x4, "bottom")
    s2 = m3(p["skip2"], s["skip2"], x2, x3, x4)
    s3 = m3(p["skip3"], s["skip3"], x1, x2, x3)
    s4 = m2(p["skip4"], s["skip4"], x1, x2, "top")

    nb = (
        nat_backend
        if isinstance(nat_backend, tuple)
        else (nat_backend,) * 4
    )
    x46 = _natt(p["natt1"], s1, num_heads, nb[0], natt_int8, ln_fold)
    x37 = _natt(p["natt2"], s2, num_heads, nb[1], natt_int8, ln_fold)
    x28 = _natt(p["natt3"], s3, num_heads, nb[2], natt_int8, ln_fold)
    x19 = _natt(p["natt4"], s4, num_heads, nb[3], natt_int8, ln_fold)

    def up(name, h_):
        return _conv(p[name], upsample2x_align_corners(h_))

    x6 = rc("dconv1_1", rc("dconv1_0", up("up1", x5) + x46))
    x7 = rc("dconv2_1", rc("dconv2_0", up("up2", x6) + x37))
    x8 = rc("dconv3_1", rc("dconv3_0", up("up3", x7) + x28))
    x9 = rc("dconv4_1", rc("dconv4_0", up("up4", x8) + x19))

    return _conv(p["output_layer"], x9).astype(jnp.float32)


_AUTOTUNE_CACHE: dict = {}


def pick_fastest(timings: dict, default=("xla", "xla")):
    """Pure winner selection for :func:`autoselect_backends` — smallest
    mean step time wins; an empty table (every candidate failed) falls
    back to the always-available XLA pair."""
    if not timings:
        return default
    return min(timings, key=timings.get)


def autoselect_backends(
    deploy_vars: dict,
    x,
    num_heads: int = 12,
    rc_candidates=("xla", "flat"),
    nat_candidates=("flat", "xla"),
    iters: int = 8,
    natt_int8: bool = False,
    time_fn=None,
):
    """One-shot serve-time autotune: time ``deploy_forward`` for each
    (rc, nat) backend combo on the REAL input shape and return the fastest
    pair.  Replaces static per-size defaults (ROADMAP item 8) — measured
    winners differ by size (rc='xla' beats the Pallas rc kernels at 256²,
    but that was only ever measured at one size; this re-decides per shape
    at the cost of a few extra compiles at engine startup).

    The 'pallas' variants are excluded from the default candidate sets:
    both were measured strictly slower at every size tried (BASELINE.md
    round-2/3 ledgers) — pass them explicitly to re-test.  A candidate
    that raises (unsupported shape/backend) is skipped, and if every
    combo fails the XLA pair is returned.  Results are cached per
    (shape, dtype, num_heads, candidates) for the process lifetime.

    ``time_fn(rc, nat) -> seconds`` is injectable for tests.
    """
    key = (tuple(x.shape), str(x.dtype), num_heads, natt_int8,
           tuple(rc_candidates), tuple(nat_candidates))
    if key in _AUTOTUNE_CACHE:
        return _AUTOTUNE_CACHE[key]

    if time_fn is None:
        import time as _time

        def time_fn(rc, nat):
            run = lambda: deploy_forward(
                deploy_vars, x, num_heads=num_heads,
                nat_backend=nat, rc_backend=rc, natt_int8=natt_int8,
            )
            run().block_until_ready()  # compile + warm outside the clock
            t0 = _time.perf_counter()
            out = None
            for _ in range(iters):
                out = run()  # async dispatch; block once to amortize RTT
            out.block_until_ready()
            return (_time.perf_counter() - t0) / iters

    timings = {}
    for rc in rc_candidates:
        for nat in nat_candidates:
            try:
                timings[(rc, nat)] = time_fn(rc, nat)
            except Exception:  # noqa: BLE001 — unsupported combo: skip it
                continue
    choice = pick_fastest(timings)
    _AUTOTUNE_CACHE[key] = choice
    return choice


def _resolve_auto(deploy_vars, x, num_heads, rc_backend, nat_backend,
                  natt_int8=False):
    """Expand 'auto' in either backend slot via :func:`autoselect_backends`,
    pinning a non-auto slot to its requested value."""
    rc_cands = ("xla", "flat") if rc_backend == "auto" else (rc_backend,)
    nat_cands = ("flat", "xla") if nat_backend == "auto" else (nat_backend,)
    return autoselect_backends(
        deploy_vars, x, num_heads,
        rc_candidates=rc_cands, nat_candidates=nat_cands, natt_int8=natt_int8,
    )


def serving_evaluate(
    state,
    loader,
    num_classes: int = 2,
    img_size: int = 256,
    compute_hd95: bool = False,
    rc_backend: str = "xla",  # 'auto' = one-shot autotune on the first batch
    nat_backend: str | None = None,  # None -> flat on TPU, xla elsewhere
    num_heads: int = 12,
    natt_int8: bool = False,
    mesh=None,
    spatial: bool = False,
    task: str = "binary",
):
    """Evaluate a *training* state through the fused serving path: reparam
    the variables once, then run ``deploy_forward`` over the loader (the
    CLI's ``--test --serve`` mode; reference --test is train.py:182-197).

    ``mesh``: optional jax.sharding.Mesh — scale-out serving: batches are
    sharded over the mesh's 'data' (+'spatial') axes and XLA partitions the
    deploy graph across chips, exactly like the training-path ``evaluate``.
    Note the Pallas NAT kernels currently require the full W·C lane extent
    per device, so 'spatial' sharding pairs with ``nat_backend='xla'``.

    Returns (total CE loss, metrics dict) exactly like ``train.loop.evaluate``
    so the two paths are drop-in comparable.
    """
    import numpy as np

    from lmnet_tpu.data import augment
    from lmnet_tpu.losses import cross_entropy_loss
    from lmnet_tpu.metrics.confusion import (
        ConfusionAccumulator,
        confusion_matrix,
        derived_metrics,
    )
    from lmnet_tpu.metrics.hd95 import hausdorff_distance_95
    from lmnet_tpu.models import structural_reparam

    if nat_backend is None:
        # under a mesh the XLA formulation partitions cleanly (a Pallas
        # custom call would force a gather); single-device keeps the kernel
        nat_backend = (
            "xla" if mesh is not None
            else "flat" if jax.default_backend() == "tpu" else "xla"
        )
    deploy_vars = structural_reparam(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    step = None

    def _make_step(rc_b, nat_b):
        @functools.partial(jax.jit, donate_argnames=("cm",))
        def step(x, y, cm):
            logits = deploy_forward(
                deploy_vars, x, num_heads=num_heads,
                rc_backend=rc_b, nat_backend=nat_b,
                natt_int8=natt_int8,
            )
            loss = cross_entropy_loss(logits, y, (1.0, 4.0), 0.001)
            preds = jnp.argmax(logits, axis=-1)
            return loss, cm + confusion_matrix(preds, y, num_classes), preds

        return step

    cm = ConfusionAccumulator.init(num_classes)
    total_loss = 0.0
    hd_vals = []
    for images, masks in loader:
        x, y = augment.eval_pipeline(images, masks, out_size=img_size)
        if mesh is not None:
            from lmnet_tpu.parallel.mesh import shard_batch

            x, y = shard_batch(mesh, x, y, spatial=spatial)
        xb = x.astype(jnp.bfloat16)
        if step is None:
            if "auto" in (rc_backend, nat_backend):
                rc_backend, nat_backend = _resolve_auto(
                    deploy_vars, xb, num_heads, rc_backend, nat_backend,
                    natt_int8=natt_int8,
                )
            step = _make_step(rc_backend, nat_backend)
        loss, cm, preds = step(xb, y, cm)
        total_loss += loss
        if compute_hd95:
            for pr, t in zip(np.asarray(preds), np.asarray(y)):
                v = hausdorff_distance_95(pr == 1, t == 1)
                if not np.isnan(v):
                    hd_vals.append(v)
    metrics = {k: float(v) for k, v in derived_metrics(cm, task).items()}
    if compute_hd95:
        metrics["hd95"] = float(np.mean(hd_vals)) if hd_vals else float("nan")
    return float(total_loss), metrics
