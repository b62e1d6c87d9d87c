"""NAT forward kernel per-stage timer + register-pressure A/B record.

SETTLED NEGATIVE (round 4). The roofline credits the NAT bucket with only
~21% of VPU peak; the suspect was compiler spills — the forward holds 9
logit + 9 exp (rows, WC) fp32 tensors live (~7 MB at rows=32, WC=3072).
Measured variants (v5e, B=128, bare kernel; e2e via deploy_forward):

  stage        hold    twopass   hold+qch8  hold+qch16
  32^2  C96   2.905     2.929      3.728      3.081   ms
  64^2  C48   3.257     3.279      4.286      3.374   ms
  128^2 C24   3.445     3.424      4.014      3.429   ms
  256^2 C12   3.946     3.986      3.961      3.923   ms
  e2e img/s  1341.5    1337.5     1340.8     1340.1

  * twopass = flash-style logit recompute (only m/den/out live);
  * qch = interior q processed in 8/16-row chunks (live set bounded by
    the chunk, stripe DMA unchanged).

Every variant is within noise or worse: Mosaic's VMEM scheduling absorbs
the large live set for free, and the kernel is genuinely bound by the
cross-lane rolls + halo DMA, not by spills.  The variant knobs were
removed from nat_flat.py after this measurement; this script remains as
the per-stage bare-kernel timer.

Usage: python perf/nat_fwd_ab.py [--batch 128] [--e2e]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 30
STAGES = [  # (H, W, C) at serving 256^2; heads=12, k=3 everywhere
    (32, 32, 96),
    (64, 64, 48),
    (128, 128, 24),
    (256, 256, 12),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--e2e", action="store_true")
    args = ap.parse_args()
    B = args.batch

    from lmnet_tpu.ops import nat as nat_xla
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(())))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"device={jax.devices()[0]} rtt={rtt*1e3:.1f} ms", flush=True)

    for H, W, C in STAGES:
        WC = W * C
        kq, kk, kv, kb = jax.random.split(jax.random.key(0), 4)
        q = jax.random.normal(kq, (B, H, WC), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, WC), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, WC), jnp.bfloat16)
        rpb = jax.random.normal(kb, (12, 5, 5), jnp.float32) * 0.02

        # reference on a small batch slice (the f32 XLA reference
        # materializes (B,H,W,heads,9) logits — OOM at B=128 256^2)
        Br = min(B, 4)
        ref = nat_xla.neighborhood_attention(
            q[:Br].reshape(Br, H, W, C).astype(jnp.float32),
            k[:Br].reshape(Br, H, W, C).astype(jnp.float32),
            v[:Br].reshape(Br, H, W, C).astype(jnp.float32),
            rpb, 3,
        ).reshape(Br, H, WC)

        def chain(q, k, v, rpb):
            def body(i, acc):
                o = nat_flat(q + acc.astype(q.dtype) * 1e-20, k, v, rpb,
                             12, C, W)
                return acc + o[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        g = jax.jit(chain)
        float(g(q, k, v, rpb))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(q, k, v, rpb))
            best = min(best, (time.perf_counter() - t0 - rtt) / ITERS)
        out = jax.jit(
            lambda q, k, v, rpb: nat_flat(q, k, v, rpb, 12, C, W)
        )(q[:Br], k[:Br], v[:Br], rpb)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        print(f"stage {H}x{W} C={C} (hd={C//12}): {best*1e3:7.3f} ms  "
              f"maxerr={err:.2e}", flush=True)

    if args.e2e:
        from lmnet_tpu.models import LMNet, structural_reparam
        from lmnet_tpu.serve.engine import deploy_forward

        model = LMNet(num_classes=2)
        variables = jax.jit(
            lambda kk: model.init(kk, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(0))
        dv = structural_reparam(variables)
        x = jnp.ones((B, 256, 256, 3), jnp.bfloat16)

        def chain(x):
            def body(i, acc):
                y = deploy_forward(
                    dv, x + acc.astype(x.dtype) * 1e-20, nat_backend="flat"
                )
                return acc + jnp.sum(y)
            return jax.lax.fori_loop(0, 10, body, jnp.zeros(()))

        g = jax.jit(chain)
        float(g(x))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = max(best, B / ((time.perf_counter() - t0 - rtt) / 10))
        print(f"e2e {best:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
