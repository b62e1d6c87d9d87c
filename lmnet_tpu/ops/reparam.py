"""Structural re-parameterization math: fuse the multi-branch depthwise
training graph into a single large depthwise kernel for deployment.

Pure pytree->pytree transforms (no modules, no mutation), mirroring the
behavior of the reference's ``ReparamConv.get_equivalent_kernel_bias`` /
``switch_to_deploy`` (reference ``core/modules.py:602-657``) but on JAX/Flax
HWIO depthwise kernels (shape ``(kh, kw, 1, C)``).

The algebra: each branch is ``BN(dwconv(x))``; BN in inference mode is an
affine map per channel, so it folds into the conv as
``kernel * gamma/std`` and ``bias = beta - mean * gamma/std``; parallel
branches of different shapes sum after embedding the small kernels into the
center of the large one (axial 3x1/1x3 into 3x3, 3x3 zero-padded into 5x5).
"""

from __future__ import annotations

import jax.numpy as jnp


def fuse_bn(
    kernel: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference-mode BatchNorm into a conv kernel (HWIO, per-out-channel).

    Returns (fused_kernel, fused_bias).
    """
    std = jnp.sqrt(var + eps)
    t = gamma / std
    return kernel * t.reshape(1, 1, 1, -1), beta - mean * t


def embed_kernel(small: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Zero-embed a small HWIO kernel into the center of a (kh, kw) one."""
    sh, sw = small.shape[0], small.shape[1]
    ph, pw = (kh - sh) // 2, (kw - sw) // 2
    return jnp.pad(small, ((ph, kh - sh - ph), (pw, kw - sw - pw), (0, 0), (0, 0)))


def merge_branches(
    kernels_and_biases: list[tuple[jnp.ndarray, jnp.ndarray]],
    large_kernel_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sum BN-fused parallel depthwise branches into one large kernel+bias."""
    kk = large_kernel_size
    kernel = jnp.zeros_like(
        embed_kernel(kernels_and_biases[0][0], kk, kk)
    )
    bias = None
    for k, b in kernels_and_biases:
        kernel = kernel + embed_kernel(k, kk, kk)
        bias = b if bias is None else bias + b
    return kernel, bias


def fuse_reparam_branches(
    branches: dict, large_kernel_size: int = 5, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse a ReparamConv's four train-time branches into deploy kernel+bias.

    ``branches`` maps branch name ('large'|'square'|'ver'|'hor') to a dict
    with 'kernel' (HWIO depthwise) and BN stats 'scale','bias','mean','var'.
    Matches reference ``get_equivalent_kernel_bias`` (core/modules.py:622-642).
    """
    fused = []
    for name in ("large", "square", "ver", "hor"):
        b = branches[name]
        fused.append(
            fuse_bn(b["kernel"], b["scale"], b["bias"], b["mean"], b["var"], eps)
        )
    return merge_branches(fused, large_kernel_size)
