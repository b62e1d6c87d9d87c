"""Flax building blocks for LM-Net, designed NHWC/TPU-first.

Behavioral parity targets (reference ``core/modules.py``):
  SE                      :1020-1044   squeeze-and-excitation
  ReparamConv             :525-657     multi-branch depthwise block + fusion
  OverlapPatchEmbed       :22-40       conv patch embed
  Mlp                     :42-56       2-layer MLP, GELU, dropout 0.1
  GlobalAttention         :235-279     full MHSA (bottleneck, 16x16 tokens)
  GFT                     :329-347     global-former bottleneck block
  PyramidPool             :454-498     multi-scale pool + concat
  M2Skip / M3Skip         :83-143      multi-scale skip fusion
  NeighborhoodTransformer :504-521     NAT block (NATTEN -> lmnet_tpu.ops.nat)

Everything is NHWC (channels on TPU lanes); there are no layout permutes
anywhere in the network — the reference's NCHW<->NHWC shuffles around NATTEN
disappear by construction.  Numerics notes:
  * GELU is the exact (erf) variant, matching ``nn.GELU`` defaults.
  * LayerNorm/BatchNorm eps = 1e-5 (torch defaults); BatchNorm momentum 0.9
    in Flax convention == torch momentum 0.1.
  * Conv/Dense use torch-style kaiming-uniform fan-in init so training
    dynamics match the reference's initialization family.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from lmnet_tpu.ops.nat import neighborhood_attention
from lmnet_tpu.ops.resize import (
    adaptive_avg_pool,
    global_avg_pool,
    upsample2x_align_corners,
)

Dtype = Any

# ---------------------------------------------------------------------------
# torch-default initializers (kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)))
# ---------------------------------------------------------------------------

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# GELU: the reference uses torch's exact erf GELU. On TPU the erf
# transcendental costs ~7.5x a tanh GELU pass (measured 1.29ms vs 0.17ms per
# 64x256^2x24 application, ~28 applications per forward) while differing by
# at most 5e-4 — below bf16 resolution. Default: tanh; pass
# ``LMNet(gelu_exact=True)`` (threaded to every block as a config field) for
# bit-parity comparisons against the erf-GELU torch reference.


def gelu(x, exact: bool = False):
    return jax.nn.gelu(x, approximate=not exact)


class TorchConv(nn.Module):
    """nn.Conv with torch-default initialization (weights and bias)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = None  # None -> torch-style k//2 explicit padding
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Any = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        parts = None
        if isinstance(x, (list, tuple)):
            # concat-free application: conv(concat(parts)) == sum of convs
            # with input-channel-sliced kernels — the concatenated tensor is
            # never materialized (a real copy on TPU). Same params either way.
            parts = list(x)
            x = jnp.concatenate(parts, axis=-1)
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        pad = self.padding
        if pad is None:
            pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
        fan_in = kh * kw * (in_ch // self.feature_group_count)
        conv = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )
        if parts is None or self.feature_group_count != 1:
            return conv(x)
        if self.is_initializing():
            return conv(x)
        p = self.variables["params"]["conv"]
        dt = self.dtype or x.dtype
        out = None
        c0 = 0
        for part in parts:
            c1 = c0 + part.shape[-1]
            o = jax.lax.conv_general_dilated(
                part.astype(dt),
                p["kernel"][:, :, c0:c1, :].astype(dt),
                self.strides,
                pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
            c0 = c1
        if self.use_bias:
            out = out + p["bias"].astype(dt)
        return out


class TorchDense(nn.Module):
    """nn.Dense with torch-default initialization.

    ``n_slices > 1`` returns the output as n equal channel slices computed
    by separate weight-sliced matmuls (same params as the fused layer).
    On TPU, slicing the fused output costs real copies (the slices don't
    alias), while per-slice matmul outputs fuse into downstream reshapes
    for free — measured 1.6 ms/stage for the NAT qkv at B=128 256^2x12.
    """

    features: int
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Dtype = None
    n_slices: int = 1

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        dense = nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_kernel_init,
            bias_init=self.bias_init or torch_bias_init(fan_in),
            dtype=self.dtype,
            name="dense",
        )
        if self.n_slices == 1:
            return dense(x)
        if self.is_initializing():
            dense(x)  # create the fused params
        params = self.variables["params"]["dense"]
        w = params["kernel"]
        b = params["bias"] if self.use_bias else None
        dt = self.dtype or x.dtype
        step = self.features // self.n_slices
        outs = []
        for i in range(self.n_slices):
            o = x.astype(dt) @ w[:, i * step : (i + 1) * step].astype(dt)
            if b is not None:
                o = o + b[i * step : (i + 1) * step].astype(dt)
            outs.append(o)
        return outs


def batch_norm(name: str, train: bool, dtype: Dtype = None) -> nn.BatchNorm:
    """torch-parity BatchNorm (eps 1e-5, torch momentum 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BNVars(nn.Module):
    """BatchNorm with the stats pass exposed: variable tree and arithmetic
    identical to ``nn.BatchNorm`` (params scale/bias, batch_stats mean/var,
    fp32 biased-variance stats, momentum 0.9, eps 1e-5), but batch statistics
    can be supplied externally — so a fused kernel (``ops/pallas/rc_train``)
    can compute them without materializing the normalized tensor's input."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

    def update_stats(self, batch_mean, batch_var) -> None:
        if not self.is_initializing():
            m = self.momentum
            self.ra_mean.value = m * self.ra_mean.value + (1 - m) * batch_mean
            self.ra_var.value = m * self.ra_var.value + (1 - m) * batch_var

    def __call__(self, y, train: bool = False):
        if train:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.maximum(
                jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean), 0.0
            )
            self.update_stats(mean, var)
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        # flax-parity arithmetic: compute in the promoted (fp32) type, cast
        # to the module dtype at the end
        out = (y - mean) * (
            jax.lax.rsqrt(var + self.epsilon) * self.scale
        ) + self.bias
        dt = self.dtype or jnp.promote_types(y.dtype, jnp.float32)
        return out.astype(dt)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class SE(nn.Module):
    """Squeeze-and-excitation (reference core/modules.py:1020-1044)."""

    channels: int
    reduction: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pooled=None):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
        # ``pooled``: optional precomputed (B, 1, 1, C) global mean — the
        # fused RC kernel emits channel sums, so x is not re-read for the
        # squeeze (see ops/pallas/rc_train.py)
        s = global_avg_pool(x) if pooled is None else pooled
        s = nn.Conv(
            self.channels // self.reduction,
            (1, 1),
            kernel_init=kaiming,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc1",
        )(s)
        s = jax.nn.relu(s)
        s = nn.Conv(
            self.channels,
            (1, 1),
            kernel_init=kaiming,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc2",
        )(s)
        s = jax.nn.hard_sigmoid(s)
        return x * s


class ReparamConv(nn.Module):
    """Re-parameterizable multi-branch depthwise block
    (reference core/modules.py:525-657).

    Train graph: 1x1 expand + BN + hardswish -> sum of 4 parallel depthwise
    branches (5x5, 3x3, 3x1, 1x3; each conv+BN) -> GELU -> SE -> 1x1
    pointwise -> + 1x1 shortcut of the input.

    Deploy graph (``deploy=True``): the 4 branches are replaced by a single
    fused 5x5 depthwise conv with bias (see ``ops/reparam.py`` and
    ``models/lm_net.py::structural_reparam``).
    """

    expand_channels: int
    out_channels: int
    large_kernel: int = 5
    small_kernel: int = 3
    stride: int = 1
    deploy: bool = False
    gelu_exact: bool = False
    dtype: Dtype = None
    # train-mode branch backend: 'auto' (== 'xla': measured FASTER than the
    # fused Pallas path at every stage shape on v5e — fwd 12.3 vs 18.8 ms,
    # fwd+bwd 25.6 vs 48.9 ms at 256^2 ec=24 B=128; see the negative-results
    # ledger in BASELINE.md), 'fused' (explicit opt-in, ops/pallas/rc_train.py:
    # never materializes a branch output or holds one as an autodiff
    # residual), 'packed' (ONE grouped conv: the 3x3/3x1/1x3 kernels are
    # zero-padded into 5x5 and stacked on the output-channel axis — 4
    # branches in a single dispatch and a single pass over the expanded
    # activation, same math; MEASURED NEGATIVE: 61.3 vs 196.8 img/s e2e
    # train at 256^2 B=128 (perf/rc_packed_ab.py) — zero taps aren't
    # skipped so it does 100 MACs/elem vs the branches' 40, and XLA was
    # already lowering the 4 separate dw convs near the VPU roofline),
    # or 'xla'.
    rc_train_backend: str = "auto"

    def _fused_train_ok(self, x1, train: bool) -> bool:
        backend = self.rc_train_backend
        if backend == "auto":
            backend = "xla"
        H, W = x1.shape[1], x1.shape[2]
        return (
            backend == "fused"
            and train
            and not self.is_initializing()
            and self.stride == 1
            and not self.gelu_exact
            and self.large_kernel == 5
            and self.small_kernel == 3
            and H >= 8
            and H % 8 == 0
            and W >= 3
            and (W * self.expand_channels) % 128 == 0
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        ec = self.expand_channels
        s = (self.stride, self.stride)
        x1 = TorchConv(ec, (1, 1), dtype=self.dtype, name="expand_conv")(x)
        # Checkpoint-policy anchor: under LMNet(rc_remat='branches') the
        # block is nn.remat'ed with save_only_these_names('rc_expand'), so
        # backward keeps THIS tensor (the expand conv output — the block's
        # one MXU product) and recomputes only elementwise BN/hswish and the
        # cheap depthwise branches + SE. Pre-BN placement matters: BN's
        # backward needs its *input*, so anchoring post-BN/hswish would
        # still force an expand-conv recompute. A no-op unless a remat
        # policy references the name.
        x1 = checkpoint_name(x1, "rc_expand")
        x1 = batch_norm("expand_bn", train, self.dtype)(x1)
        x1 = jax.nn.hard_swish(x1)

        def dw(name, ksize):
            return TorchConv(
                ec,
                ksize,
                strides=s,
                feature_group_count=ec,
                use_bias=False,
                dtype=self.dtype,
                name=name,
            )

        se = SE(ec, dtype=self.dtype, name="se")
        if self.deploy:
            out = TorchConv(
                ec,
                (self.large_kernel, self.large_kernel),
                strides=s,
                feature_group_count=ec,
                use_bias=True,
                dtype=self.dtype,
                name="fuse_conv",
            )(x1)
            x1 = se(gelu(out, self.gelu_exact))
        else:
            lk, sk = self.large_kernel, self.small_kernel
            bns = [
                BNVars(ec, dtype=self.dtype, name=f"{n}_bn")
                for n in ("large", "square", "ver", "hor")
            ]
            packed_ok = (
                self.rc_train_backend == "packed"
                and train
                and not self.is_initializing()
                and lk == 5
                and sk == 3
            )
            if packed_ok:
                # one grouped conv over x1 instead of four (VERDICT r3 ask
                # #6): zero-pad every branch kernel into 5x5 (zero taps ==
                # smaller kernel with smaller same-padding, so the math is
                # identical) and stack per input channel, output layout
                # [c*4 + b] (feature_group_count groups are contiguous)
                p = self.variables["params"]
                kl = p["large_conv"]["conv"]["kernel"]  # (5,5,1,ec)
                ks_ = jnp.pad(
                    p["square_conv"]["conv"]["kernel"], ((1, 1), (1, 1), (0, 0), (0, 0))
                )
                kv = jnp.pad(
                    p["ver_conv"]["conv"]["kernel"], ((1, 1), (2, 2), (0, 0), (0, 0))
                )
                kh = jnp.pad(
                    p["hor_conv"]["conv"]["kernel"], ((2, 2), (1, 1), (0, 0), (0, 0))
                )
                packed = jnp.stack([kl, ks_, kv, kh], axis=-1)  # (5,5,1,ec,4)
                packed = packed.reshape(5, 5, 1, ec * 4)
                dt = self.dtype or x1.dtype
                y = jax.lax.conv_general_dilated(
                    x1.astype(dt), packed.astype(dt), s, [(2, 2), (2, 2)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=ec,
                )
                B, H, W, _ = y.shape
                y5 = y.reshape(B, H, W, ec, 4)
                out = bns[0](y5[..., 0], train)
                for i in range(1, 4):
                    out = out + bns[i](y5[..., i], train)
                x1 = se(gelu(out, self.gelu_exact))
            elif self._fused_train_ok(x1, train):
                from lmnet_tpu.ops.pallas.rc_train import rc_branch_act

                B, H, W, _ = x1.shape
                p = self.variables["params"]
                kernels = [
                    p[n]["conv"]["kernel"]
                    for n in ("large_conv", "square_conv", "ver_conv", "hor_conv")
                ]
                gamma = jnp.stack([bn.scale for bn in bns])
                beta = jnp.stack([bn.bias for bn in bns])
                t_flat, sums, mu, var = rc_branch_act(
                    x1.reshape(B, H, W * ec), *kernels, gamma, beta,
                    ec, 1e-5, jax.default_backend() != "tpu",
                )
                for i, bn in enumerate(bns):
                    bn.update_stats(mu[i], var[i])
                pooled = (sums.reshape(B, W, ec).sum(axis=1) / (H * W)).reshape(
                    B, 1, 1, ec
                )
                x1 = se(t_flat.reshape(B, H, W, ec), pooled=pooled.astype(x1.dtype))
            else:
                out = bns[0](dw("large_conv", (lk, lk))(x1), train)
                out = out + bns[1](dw("square_conv", (sk, sk))(x1), train)
                out = out + bns[2](dw("ver_conv", (sk, 1))(x1), train)
                out = out + bns[3](dw("hor_conv", (1, sk))(x1), train)
                x1 = se(gelu(out, self.gelu_exact))
        x1 = TorchConv(self.out_channels, (1, 1), dtype=self.dtype, name="pointwise_conv")(x1)
        return x1 + TorchConv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)


class Mlp(nn.Module):
    """2-layer MLP, exact GELU, dropout 0.1 (reference core/modules.py:42-56)."""

    hidden: int
    out: int
    drop: float = 0.1
    gelu_exact: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchDense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x, self.gelu_exact)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = TorchDense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    """Conv patch embedding (reference core/modules.py:22-40). NHWC in/out."""

    embed_dim: int
    patch_size: int = 3
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return TorchConv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            dtype=self.dtype,
            name="proj",
        )(x)


class GlobalAttention(nn.Module):
    """Full MHSA over flattened tokens (reference core/modules.py:235-279).

    Linears use trunc-normal(0.02) weight / zero bias init, matching the
    reference's ``_init_weights``.
    """

    dim: int
    num_heads: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):  # x: (B, N, C)
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(
            3 * C,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, hd)
        scale = hd**-0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, optimize=True)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, optimize=True).reshape(B, N, C)
        return nn.Dense(
            C,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(out)


class GFT(nn.Module):
    """Global-former bottleneck (reference core/modules.py:329-347):
    patch embed -> LN -> MHSA (+res) -> LN -> MLP (+res) -> 1x1 conv."""

    dim: int
    out_channels: int
    num_heads: int = 12
    mlp_ratio: int = 2
    patch_size: int = 3
    gelu_exact: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # NHWC
        B, H, W, C = x.shape
        emb = OverlapPatchEmbed(self.dim, self.patch_size, 1, self.dtype, name="embed")(x)
        tokens = emb.reshape(B, H * W, self.dim)
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tokens)
        att = GlobalAttention(self.dim, self.num_heads, self.dtype, name="attn")(ln1) + tokens
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(att)
        out = Mlp(
            self.mlp_ratio * self.dim, self.dim,
            gelu_exact=self.gelu_exact, dtype=self.dtype, name="mlp",
        )(ln2, deterministic) + att
        out = out.reshape(B, H, W, self.dim)
        return TorchConv(self.out_channels, (1, 1), dtype=self.dtype, name="out_conv")(out)


def pyramid_pool(xs: Sequence[jnp.ndarray], x_last: jnp.ndarray) -> jnp.ndarray:
    """Adaptive-avg-pool every scale to x_last's (H, W) and channel-concat
    (reference core/modules.py:495-498)."""
    h, w = x_last.shape[1], x_last.shape[2]
    pooled = [adaptive_avg_pool(x, (h, w)) for x in xs]
    return jnp.concatenate(pooled + [x_last], axis=-1)


class M3Skip(nn.Module):
    """3-scale skip fusion (reference core/modules.py:83-107): downsample the
    large scale, 3x3 the mid, upsample the small; concat; 3x3+BN+GELU fuse."""

    channels: tuple[int, int, int]  # (large, mid, small) channel counts
    gelu_exact: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, xl, xm, xs, train: bool = False):
        cm = self.channels[1]
        a = TorchConv(cm, (3, 3), strides=(2, 2), dtype=self.dtype, name="convl")(xl)
        b = TorchConv(cm, (3, 3), dtype=self.dtype, name="convm")(xm)
        c = TorchConv(cm, (3, 3), dtype=self.dtype, name="convs")(
            upsample2x_align_corners(xs)
        )
        # concat-free fuse conv (see TorchConv): conv(concat) == sum of
        # input-sliced convs, no materialized (.., 3*cm) tensor
        x = TorchConv(cm, (3, 3), dtype=self.dtype, name="fuse_conv")([a, b, c])
        x = batch_norm("fuse_bn", train, self.dtype)(x)
        return gelu(x, self.gelu_exact)


class M2Skip(nn.Module):
    """2-scale skip fusion (reference core/modules.py:109-143).

    mode='bottom': downsample the larger map to the smaller grid;
    mode='top': upsample the smaller map to the larger grid.
    """

    channels: tuple[int, int]  # (large-scale ch, small-scale ch)
    mode: str = "bottom"
    gelu_exact: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, xl, xs, train: bool = False):
        if self.mode == "bottom":
            cout = self.channels[1]
            a = TorchConv(cout, (3, 3), strides=(2, 2), dtype=self.dtype, name="convl")(xl)
            b = TorchConv(cout, (3, 3), dtype=self.dtype, name="convs")(xs)
        else:
            cout = self.channels[0]
            a = TorchConv(cout, (3, 3), dtype=self.dtype, name="convl")(xl)
            b = TorchConv(cout, (3, 3), dtype=self.dtype, name="convs")(
                upsample2x_align_corners(xs)
            )
        x = TorchConv(cout, (3, 3), dtype=self.dtype, name="fuse_conv")([a, b])
        x = batch_norm("fuse_bn", train, self.dtype)(x)
        return gelu(x, self.gelu_exact)


class NeighborhoodAttention2D(nn.Module):
    """NAT layer with qkv/proj linears + relative position bias — the module
    face of ``ops.nat.neighborhood_attention`` (replaces the NATTEN CUDA op,
    reference core/modules.py:18,509).

    ``backend``: 'auto' (fused Pallas kernel on TPU, XLA formulation
    elsewhere), 'pallas', or 'xla'.
    """

    dim: int
    num_heads: int
    kernel_size: int = 3
    dtype: Dtype = None
    backend: str = "auto"

    @nn.compact
    def __call__(self, x):  # NHWC
        C = self.dim
        # weight-sliced qkv (same params as the fused layer): splitting a
        # fused (.., 3C) output costs real copies on TPU — see TorchDense
        q, k, v = TorchDense(3 * C, dtype=self.dtype, n_slices=3, name="qkv")(x)
        rpb = self.param(
            "rpb",
            trunc_normal_init,
            (self.num_heads, 2 * self.kernel_size - 1, 2 * self.kernel_size - 1),
        )
        backend = self.backend
        if backend == "auto":
            backend = "flat" if (
                jax.default_backend() == "tpu" and self.kernel_size == 3
            ) else "xla"
        if backend == "flat":
            # fused flat-layout kernel: no NHWC<->NHCW transposes
            from lmnet_tpu.ops.pallas.nat_flat import nat_flat

            B, H, W, _ = q.shape
            out = nat_flat(
                q.reshape(B, H, W * C),
                k.reshape(B, H, W * C),
                v.reshape(B, H, W * C),
                rpb, self.num_heads, C, W,
            ).reshape(B, H, W, C)
        elif backend == "pallas":
            from lmnet_tpu.ops.pallas.nat_kernel import neighborhood_attention_pallas

            out = neighborhood_attention_pallas(q, k, v, rpb, self.kernel_size)
        else:
            out = neighborhood_attention(q, k, v, rpb, self.kernel_size)
        return TorchDense(C, dtype=self.dtype, name="proj")(out)


class NeighborhoodTransformer(nn.Module):
    """NAT block (reference core/modules.py:504-521): patch embed -> LN ->
    NAT (+res on embedding) -> LN -> MLP (+res).  Stays NHWC throughout."""

    dim: int
    num_heads: int = 12
    kernel_size: int = 3
    patch_size: int = 3
    gelu_exact: bool = False
    dtype: Dtype = None
    nat_backend: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        emb = OverlapPatchEmbed(self.dim, self.patch_size, 1, self.dtype, name="embed")(x)
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(emb)
        att = NeighborhoodAttention2D(
            self.dim, self.num_heads, self.kernel_size, self.dtype,
            backend=self.nat_backend, name="attn",
        )(ln1) + emb
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(att)
        return Mlp(
            2 * self.dim, self.dim,
            gelu_exact=self.gelu_exact, dtype=self.dtype, name="mlp",
        )(ln2, deterministic) + att
