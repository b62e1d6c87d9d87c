"""Compiled-path parity + timing of the fused NAT backward on real TPU.

Compares nat_flat_bwd (Pallas, compiled) against the XLA-formulation vjp at
the four LM-Net stage shapes, then times both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lmnet_tpu.ops.pallas.nat_flat import _nat_flat_ref, nat_flat_bwd

B = 8
rng = np.random.RandomState(0)

# the model's NAT heads is 12 at every stage (hd = 2, 4, 8, 16)
for H, C, heads in [(128, 24, 12), (64, 48, 12), (32, 96, 12), (16, 192, 12)]:
    W = H
    scale = float(C // heads) ** -0.5
    q, k, v, g = (
        jnp.asarray(rng.randn(B, H, W * C), jnp.float32) for _ in range(4)
    )
    rpb = jnp.asarray(rng.randn(heads, 5, 5) * 0.3, jnp.float32)

    f_pallas = jax.jit(
        lambda q, k, v, rpb, g: nat_flat_bwd(q, k, v, rpb, g, heads, C, W, scale)
    )
    def f_xla(q, k, v, rpb, g):
        _, vjp = jax.vjp(
            lambda q, k, v, rpb: _nat_flat_ref(q, k, v, rpb, heads, C, W, scale),
            q, k, v, rpb,
        )
        return vjp(g)
    f_xla = jax.jit(f_xla)

    got = jax.tree.map(np.asarray, f_pallas(q, k, v, rpb, g))
    want = jax.tree.map(np.asarray, f_xla(q, k, v, rpb, g))
    errs = []
    for name, a, b in zip(("dq", "dk", "dv", "drpb"), got, want):
        denom = np.abs(b).max() + 1e-30
        errs.append(f"{name}={np.abs(a - b).max() / denom:.2e}")
    print(f"H={H:4d} C={C:4d} heads={heads}  rel errs: {' '.join(errs)}")

    for name, f in (("pallas", f_pallas), ("xla   ", f_xla)):
        outs = f(q, k, v, rpb, g)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for _ in range(10):
            outs = f(q, k, v, rpb, g)
        jax.block_until_ready(outs)
        print(f"    bwd {name}: {(time.perf_counter() - t0) / 10 * 1e3:8.3f} ms")
