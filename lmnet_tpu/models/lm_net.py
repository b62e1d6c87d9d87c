"""LM-Net: lightweight multi-scale U-shaped encoder-decoder, TPU-native.

Graph parity with reference ``core/LM_Net.py:5-123``:
  * 4 encoder stages of 2x ReparamConv + 3x3/s2 downsample
    (filters 12/24/48/96, bottleneck 192; spatial 256->128->64->32->16),
  * PyramidPool + GFT global-attention bottleneck at 16x16 tokens,
  * M2/M3 multi-scale skip fusion feeding 4 NeighborhoodTransformer blocks,
  * decoder of bilinear-2x (align_corners=True) + 3x3 conv, additive skip,
    2x ReparamConv per stage; 1x1 conv head -> raw logits.

Model is NHWC and shape-polymorphic (256/384/512 inputs all trace cleanly).
``structural_reparam`` is the deploy-time kernel-fusion transform
(reference ``LM_Net.structural_reparam``, core/LM_Net.py:90-93) as a pure
pytree->pytree function.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lmnet_tpu.models.blocks import (
    GFT,
    M2Skip,
    M3Skip,
    NeighborhoodTransformer,
    ReparamConv,
    TorchConv,
    pyramid_pool,
    upsample2x_align_corners,
)
from lmnet_tpu.ops.reparam import fuse_reparam_branches


class LMNet(nn.Module):
    """The LM-Net segmentation model.

    Args:
      num_classes: output channels of the 1x1 head (reference default 2).
      filters: per-stage channel plan (reference default (12,24,48,96,192)).
      deep_supervision: accepted for CLI parity; the reference never reads it
        in ``forward`` (core/LM_Net.py:8) so it is a no-op here too.
      deploy: use the fused single-kernel ReparamConv graph (after
        ``structural_reparam``).
      dtype: computation dtype (params stay float32); bf16 is the AMP analogue.
    """

    num_classes: int = 2
    filters: tuple[int, ...] = (12, 24, 48, 96, 192)
    deep_supervision: bool = False
    deploy: bool = False
    num_heads: int = 12
    gelu_exact: bool = False  # erf GELU (torch nn.GELU parity); default tanh
    dtype: Any = None
    nat_backend: str = "auto"  # 'auto' | 'pallas' | 'xla' (see blocks.NeighborhoodAttention2D)
    rc_train_backend: str = "auto"  # 'auto' | 'fused' | 'xla' (see blocks.ReparamConv)
    # Remat (jax.checkpoint) every ReparamConv block so the backward pass
    # recomputes the 4 depthwise branches instead of storing their ~B*H*W*ec
    # activations as autodiff residuals. At B=128/256² the stored branches
    # push HBM past capacity and XLA falls back to *compressed* remat — giant
    # transposing copies the core stalls on (~65% idle step time, measured:
    # perf/xplane_top.py gap analysis). Recompute is a handful of cheap
    # depthwise convs; eval/deploy graphs are unaffected (no grad = no
    # recompute). Default on for training.
    #   False      — no remat (XLA decides what to spill)
    #   True/'full'— recompute the whole block from its input
    #   'branches' — keep the expanded activation (the block's one MXU
    #                product, checkpoint_name 'rc_expand' in blocks.py) and
    #                recompute only the depthwise branches + SE
    rc_remat: bool | str = True
    # Remat the four NeighborhoodTransformer blocks as well. Each NATT block
    # at high resolution holds ~10 (B,H,W,C) autodiff residuals (LN outputs,
    # qkv, attention out, MLP hidden); recomputing the block from its skip
    # input keeps ONE residual instead. Off by default: at 256² B=128 it
    # costs ~7% (199.1 -> 185.5 img/s, the backward re-runs qkv/NAT/MLP —
    # perf/remat_wide_ab.py + BASELINE.md round-4 ledger). It is purely a
    # *fit* lever: it lets otherwise-OOM train graphs (B=256 at 256², or
    # high-res configs) compile at the price of that recompute tax.
    natt_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool | None = None):
        det = (not train) if deterministic is None else deterministic
        f = self.filters
        dt = self.dtype
        ge = self.gelu_exact

        # static_argnums=(2,): `train`; flax offsets for `self` internally
        if self.rc_remat and not self.deploy:
            policy = (
                jax.checkpoint_policies.save_only_these_names("rc_expand")
                if self.rc_remat == "branches"
                else None  # True/'full': recompute everything from the input
            )
            rc_cls = nn.remat(ReparamConv, static_argnums=(2,), policy=policy)
        else:
            rc_cls = ReparamConv

        def rc(name, expand, out):
            return rc_cls(
                expand, out, 5, 3, deploy=self.deploy, gelu_exact=ge, dtype=dt,
                rc_train_backend=self.rc_train_backend, name=name,
            )

        def down(name, ch, h):
            return TorchConv(ch, (3, 3), strides=(2, 2), dtype=dt, name=name)(h)

        def up(name, ch, h):
            return TorchConv(ch, (3, 3), dtype=dt, name=name)(upsample2x_align_corners(h))

        # --- encoder ---------------------------------------------------
        x1 = rc("conv1_0", f[1], f[0])(x, train)
        x1 = rc("conv1_1", f[1], f[0])(x1, train)
        xd1 = down("down1", f[1], x1)
        x2 = rc("conv2_0", f[2], f[1])(xd1, train)
        x2 = rc("conv2_1", f[2], f[1])(x2, train)
        xd2 = down("down2", f[2], x2)
        x3 = rc("conv3_0", f[3], f[2])(xd2, train)
        x3 = rc("conv3_1", f[3], f[2])(x3, train)
        xd3 = down("down3", f[3], x3)
        x4 = rc("conv4_0", f[4], f[3])(xd3, train)
        x4 = rc("conv4_1", f[4], f[3])(x4, train)
        xd4 = down("down4", f[4], x4)

        # --- global bottleneck -----------------------------------------
        x5 = GFT(
            dim=sum(f),
            out_channels=f[4],
            num_heads=self.num_heads,
            mlp_ratio=2,
            gelu_exact=ge,
            dtype=dt,
            name="gft",
        )(pyramid_pool([x1, x2, x3, x4], xd4), det)

        # --- multi-scale skips + neighborhood attention ----------------
        s1 = M2Skip((f[2], f[3]), "bottom", gelu_exact=ge, dtype=dt, name="skip1")(x3, x4, train)
        s2 = M3Skip((f[1], f[2], f[3]), gelu_exact=ge, dtype=dt, name="skip2")(x2, x3, x4, train)
        s3 = M3Skip((f[0], f[1], f[2]), gelu_exact=ge, dtype=dt, name="skip3")(x1, x2, x3, train)
        s4 = M2Skip((f[0], f[1]), "top", gelu_exact=ge, dtype=dt, name="skip4")(x1, x2, train)

        natt_cls = (
            nn.remat(NeighborhoodTransformer, static_argnums=(2,))
            if self.natt_remat and not self.deploy
            else NeighborhoodTransformer
        )

        def natt(name, dim):
            return natt_cls(
                dim, self.num_heads, gelu_exact=ge, dtype=dt,
                nat_backend=self.nat_backend, name=name,
            )

        x46 = natt("natt1", f[3])(s1, det)
        x37 = natt("natt2", f[2])(s2, det)
        x28 = natt("natt3", f[1])(s3, det)
        x19 = natt("natt4", f[0])(s4, det)

        # --- decoder ----------------------------------------------------
        x6 = up("up1", f[3], x5) + x46
        x6 = rc("dconv1_0", f[4], f[3])(x6, train)
        x6 = rc("dconv1_1", f[4], f[3])(x6, train)
        x7 = up("up2", f[2], x6) + x37
        x7 = rc("dconv2_0", f[3], f[2])(x7, train)
        x7 = rc("dconv2_1", f[3], f[2])(x7, train)
        x8 = up("up3", f[1], x7) + x28
        x8 = rc("dconv3_0", f[2], f[1])(x8, train)
        x8 = rc("dconv3_1", f[2], f[1])(x8, train)
        x9 = up("up4", f[0], x8) + x19
        x9 = rc("dconv4_0", f[1], f[0])(x9, train)
        x9 = rc("dconv4_1", f[1], f[0])(x9, train)

        out = TorchConv(self.num_classes, (1, 1), dtype=dt, name="output_layer")(x9)
        return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# deploy-time structural re-parameterization (pure pytree transform)
# ---------------------------------------------------------------------------

_BRANCH_PREFIXES = ("large_", "square_", "ver_", "hor_")


def _is_reparam_node(p) -> bool:
    return isinstance(p, dict) and "large_conv" in p and "square_conv" in p


def _fuse_params(p, s):
    if not isinstance(p, dict):
        return p
    if _is_reparam_node(p):
        branches = {}
        for name in ("large", "square", "ver", "hor"):
            branches[name] = dict(
                kernel=p[f"{name}_conv"]["conv"]["kernel"],
                scale=p[f"{name}_bn"]["scale"],
                bias=p[f"{name}_bn"]["bias"],
                mean=s[f"{name}_bn"]["mean"],
                var=s[f"{name}_bn"]["var"],
            )
        large_k = p["large_conv"]["conv"]["kernel"].shape[0]
        kernel, bias = fuse_reparam_branches(branches, large_k)
        out = {
            k: _fuse_params(v, s.get(k, {}) if isinstance(s, dict) else {})
            for k, v in p.items()
            if not any(k.startswith(pref) for pref in _BRANCH_PREFIXES)
        }
        out["fuse_conv"] = {"conv": {"kernel": kernel, "bias": bias}}
        return out
    return {
        k: _fuse_params(v, s.get(k, {}) if isinstance(s, dict) else {})
        for k, v in p.items()
    }


def _prune_stats(s, p):
    """Drop branch-BN running stats that the deploy graph no longer has."""
    if not isinstance(s, dict):
        return s
    out = {}
    for k, v in s.items():
        if _is_reparam_node(p.get(k, {})) if isinstance(p, dict) else False:
            sub = {
                kk: vv
                for kk, vv in v.items()
                if not any(kk.startswith(pref) for pref in _BRANCH_PREFIXES)
            }
            out[k] = sub
        else:
            out[k] = _prune_stats(v, p.get(k, {}) if isinstance(p, dict) else {})
    return out


def structural_reparam(variables: dict) -> dict:
    """Fuse every ReparamConv's branches for deployment.

    Input: train-mode ``{'params': ..., 'batch_stats': ...}``.
    Output: variables for ``LMNet(deploy=True)`` — branch convs+BNs replaced
    by a single fused 5x5 depthwise ``fuse_conv`` (kernel+bias); all other
    params and the remaining BN stats are unchanged.

    Runs as ONE jitted program: the fusion math is ~20 small ops per
    ReparamConv and eager dispatch pays a full host<->device round trip
    per op on remote-TPU backends (~0.4 s/op measured through the tunnel).
    The pytree traversal itself is trace-time (key names only).
    """
    import flax

    def transform(variables):
        variables = flax.core.unfreeze(variables)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        new_params = _fuse_params(params, stats)
        new_stats = _prune_stats(stats, params)
        out = dict(variables)
        out["params"] = new_params
        if "batch_stats" in out:
            out["batch_stats"] = new_stats
        return out

    return jax.jit(transform)(variables)
