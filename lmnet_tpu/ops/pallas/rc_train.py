"""Fused train-mode ReparamConv branches: 4 depthwise convs + 4 batch-stat
BatchNorms + sum + GELU + SE channel sums, without materializing any branch.

The reference's train graph (``core/modules.py:586-600``) materializes four
parallel depthwise branch outputs (5x5, 3x3, 3x1, 1x3), runs a BN stats pass
over each, normalizes each, and sums — measured 11.2 of the 17 ms stage-1
block forward at B=32 (BASELINE.md round-2 ledger), plus four saved branch
tensors held as autodiff residuals (the reason B=192 fails to compile).

The fold that removes all of it: summing batch-normalized parallel depthwise
branches IS a single combined depthwise conv,

    sum_i BN_i(dw_i(e)) = dw_K(e) + b,
    K = sum_i (gamma_i / sigma_i) * embed_5x5(k_i),
    b = sum_i (beta_i - gamma_i * mu_i / sigma_i),

where (mu_i, sigma_i) are the *batch* statistics of branch i — the same
algebra as deploy-time ``structural_reparam`` (``ops/reparam.py``), applied
per training step with live stats.  So the forward is:

  1. a stats-only Pallas pass over the flat ``(B, H, W*C)`` activation
     (see rc_flat.py for the layout: W*C == 6144 at every LM-Net stage):
     all 40 branch taps share 5 lane rotations, and only per-branch
     channel sums/sum-of-squares leave the kernel — no branch output
     ever touches HBM;
  2. a tiny jnp fold (``ops.reparam.fuse_reparam_branches`` with batch
     stats) building the combined 25-tap flat kernel;
  3. the existing deploy-path kernel ``rc_flat.dw_gelu_flat`` (combined
     dw + bias + GELU + SE channel sums, one HBM read + one write).

The backward is flash-style: nothing is saved but the primals; the vjp
recomputes through a plain-XLA reference of the branch graph (exact wrt the
unfused formulation by construction).  The batch-stat outputs (mu, var) feed
only the BatchNorm running-average update, which is stop-gradient in both
torch and flax — their cotangents are ignored.

Numerics: stats and the combined conv accumulate in fp32 (matching flax
BatchNorm's fp32 stats); under bf16 activations the combined-form z differs
from the branch-wise form by bf16 rounding only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmnet_tpu.ops.pallas.rc_flat import _flat_weights, dw_gelu_flat
from lmnet_tpu.ops.reparam import fuse_reparam_branches

# branch order matches the reference sum (core/modules.py:592-595)
_BRANCH_SHAPES = ((5, 5), (3, 3), (3, 1), (1, 3))


def _branch_taps():
    """Static tap list [(branch_idx, dh, dw)] in global 5x5 offsets."""
    taps = []
    for bi, (kh, kw) in enumerate(_BRANCH_SHAPES):
        for i in range(kh):
            for j in range(kw):
                taps.append((bi, i - kh // 2, j - kw // 2))
    return taps  # 25 + 9 + 3 + 3 = 40


_TAPS = _branch_taps()


def _flat_branch_weights(kernels, W: int) -> jnp.ndarray:
    """(40, W*C) masked flat tap weights for the 4 branch kernels (HWIO
    depthwise); W-border zero padding folded into the weights as in
    ``rc_flat._flat_weights``."""
    C = kernels[0].shape[-1]
    w_idx = np.repeat(np.arange(W), C)
    rows = []
    for bi, dh, dw in _TAPS:
        k = kernels[bi]
        kh, kw = k.shape[0], k.shape[1]
        tap = jnp.tile(k[dh + kh // 2, dw + kw // 2, 0, :].astype(jnp.float32), W)
        src = w_idx + dw
        valid = jnp.asarray((src >= 0) & (src < W), jnp.float32)
        rows.append(tap * valid)
    return jnp.stack(rows, 0)


def _rc_stats_kernel(eu_ref, ec_ref, ed_ref, w_ref, s_ref, hscr,
                     *, rows: int, C: int):
    """Per-branch channel sums and sum-of-squares of the (unmaterialized)
    branch outputs, accumulated across the whole (B, nb) grid into one
    (8, W*C) block: rows 2i / 2i+1 = sum / sumsq of branch i."""
    b = pl.program_id(0)
    ib = pl.program_id(1)
    nb = pl.num_programs(1)
    WC = ec_ref.shape[3]

    # 2-row halo from 8-row neighbor edge blocks (Pallas block-dim rule)
    hscr[0:2] = eu_ref[0, 0, 6:8]
    hscr[2 : rows + 2] = ec_ref[0, 0]
    hscr[rows + 2 : rows + 4] = ed_ref[0, 0, 0:2]

    @pl.when(ib == 0)
    def _():
        hscr[0:2] = jnp.zeros((2, WC), hscr.dtype)

    @pl.when(ib == nb - 1)
    def _():
        hscr[rows + 2 : rows + 4] = jnp.zeros((2, WC), hscr.dtype)

    full = hscr[:].astype(jnp.float32)  # (rows + 4, WC)
    # all 40 taps share 5 lane rotations (sh[r, l] == e[r, l + dw*C]).
    # Roll-major loop: only ONE rotated copy is live at a time — keeping all
    # five alive overflowed the 16 MB scoped-vmem limit at WC=6144
    # (measured 16.28M with rows=16).
    ys = [jnp.zeros((rows, WC), jnp.float32) for _ in range(4)]
    for dw in (-2, -1, 0, 1, 2):
        sh = pltpu.roll(full, shift=(-dw * C) % WC, axis=1) if dw else full
        for ti, (bj, dh, dwj) in enumerate(_TAPS):
            if dwj != dw:
                continue
            ys[bj] = ys[bj] + sh[2 + dh : 2 + dh + rows] * w_ref[ti][None, :]
    parts = []
    for y in ys:
        parts.append(jnp.sum(y, axis=0, keepdims=True))
        parts.append(jnp.sum(y * y, axis=0, keepdims=True))
    part = jnp.concatenate(parts, axis=0)  # (8, WC)

    @pl.when((b == 0) & (ib == 0))
    def _():
        s_ref[...] = part

    @pl.when((b > 0) | (ib > 0))
    def _():
        s_ref[...] = s_ref[...] + part


@functools.partial(jax.jit, static_argnames=("C", "interpret"))
def rc_branch_stats(e_flat: jnp.ndarray, wflat: jnp.ndarray, C: int,
                    interpret: bool = False) -> jnp.ndarray:
    """(8, W*C) flat per-branch [sum, sumsq] x 4 over the whole batch."""
    B, H, WC = e_flat.shape
    # rows=16: the 5 shared lane-rotated copies of the fp32 halo block are
    # the big VMEM consumer; 32-row stripes exceed the 16 MB scoped-vmem
    # limit at WC=6144 (measured 18.95M)
    rows = min(16, H)
    while H % rows:
        rows //= 2
    assert rows >= 8, f"H={H} unsupported (need H % 8 == 0)"
    nb = H // rows
    e4 = e_flat.reshape(B, nb, rows, WC)
    center = pl.BlockSpec((1, 1, rows, WC), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
    edge_up = pl.BlockSpec(
        (1, 1, 8, WC), lambda b, i: (b, jnp.maximum(i - 1, 0), rows // 8 - 1, 0),
        memory_space=pltpu.VMEM,
    )
    edge_dn = pl.BlockSpec(
        (1, 1, 8, WC), lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_rc_stats_kernel, rows=rows, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, nb),
        interpret=interpret,
        in_specs=[
            edge_up, center, edge_dn,
            pl.BlockSpec((40, WC), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, WC), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, WC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows + 4, WC), e_flat.dtype)],
    )(e4, e4, e4, wflat)


def _rc_ref_jnp(e_flat, k5, k3, kv, kh3, gamma, beta, C: int, eps: float):
    """Plain-XLA reference of the branch graph (conv + batch-stat BN + sum
    + tanh GELU + flat channel sums) — the vjp target for the fused op and
    the parity oracle for its forward.  Mirrors ``blocks.ReparamConv``'s
    unfused arithmetic (flax BatchNorm semantics: fp32 stats, biased var)."""
    B, H, WC = e_flat.shape
    W = WC // C
    e = e_flat.reshape(B, H, W, C)
    z = None
    for i, k in enumerate((k5, k3, kv, kh3)):
        kh, kw = k.shape[0], k.shape[1]
        y = jax.lax.conv_general_dilated(
            e, k.astype(e.dtype), (1, 1),
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.maximum(
            jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean), 0.0
        )
        mul = jax.lax.rsqrt(var + eps) * gamma[i]
        bn = (yf - mean) * mul + beta[i]
        z = bn if z is None else z + bn
    t = jax.nn.gelu(z, approximate=True).astype(e_flat.dtype)
    t_flat = t.reshape(B, H, WC)
    return t_flat, jnp.sum(t_flat.astype(jnp.float32), axis=1)


def _fold_stats(stats8: jnp.ndarray, N: int, W: int, C: int):
    """(8, W*C) kernel accumulators -> (4, C) mu and biased var."""
    s = stats8.reshape(8, W, C).sum(axis=1)  # (8, C)
    sums, sqs = s[0::2], s[1::2]  # (4, C) each
    mu = sums / N
    var = jnp.maximum(sqs / N - jnp.square(mu), 0.0)
    return mu, var


def _fwd_impl(e_flat, k5, k3, kv, kh3, gamma, beta, C, eps, interpret):
    B, H, WC = e_flat.shape
    W = WC // C
    wflat40 = _flat_branch_weights((k5, k3, kv, kh3), W)
    stats8 = rc_branch_stats(e_flat, wflat40, C, interpret)
    mu, var = _fold_stats(stats8, B * H * W, W, C)
    branches = {
        name: {"kernel": k, "scale": gamma[i], "bias": beta[i],
               "mean": mu[i], "var": var[i]}
        for i, (name, k) in enumerate(
            zip(("large", "square", "ver", "hor"), (k5, k3, kv, kh3))
        )
    }
    K, b = fuse_reparam_branches(branches, 5, eps)
    t_flat, sums = dw_gelu_flat(
        e_flat, _flat_weights(K.astype(jnp.float32), W),
        jnp.tile(b.astype(jnp.float32), W), C, interpret=interpret,
    )
    return t_flat, sums, mu, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def rc_branch_act(e_flat, k5, k3, kv, kh3, gamma, beta,
                  C: int, eps: float = 1e-5, interpret: bool = False):
    """Fused 4-branch + BN + sum + GELU on flat (B, H, W*C) activations.

    Args: branch kernels HWIO depthwise ((5,5,1,C), (3,3,1,C), (3,1,1,C),
    (1,3,1,C)); gamma/beta (4, C) BN affine params.
    Returns (t_flat (B,H,W*C), chan_sums (B,W*C) fp32, mu (4,C), var (4,C));
    mu/var are the batch stats for the caller's BN running-average update
    (non-differentiable, as running stats are in torch/flax).
    """
    return _fwd_impl(e_flat, k5, k3, kv, kh3, gamma, beta, C, eps, interpret)


def _rc_fwd(e_flat, k5, k3, kv, kh3, gamma, beta, C, eps, interpret):
    out = _fwd_impl(e_flat, k5, k3, kv, kh3, gamma, beta, C, eps, interpret)
    return out, (e_flat, k5, k3, kv, kh3, gamma, beta)


def _rc_bwd(C, eps, interpret, res, cts):
    dt, dsums, _dmu, _dvar = cts  # running-stat path is stop-grad
    e_flat, k5, k3, kv, kh3, gamma, beta = res
    _, vjp = jax.vjp(
        lambda e, a, b_, c, d, g, bt: _rc_ref_jnp(e, a, b_, c, d, g, bt, C, eps),
        e_flat, k5, k3, kv, kh3, gamma, beta,
    )
    return vjp((dt, dsums))


rc_branch_act.defvjp(_rc_fwd, _rc_bwd)
