"""TPU A/B: NAT forward stripe policy above WC=3072 (384^2 / 512^2).

The HOLD form's scoped-VMEM caps force 16-row stripes at WC=4608 and
8-row at WC=6144, amortizing the 16 halo rows (2x 8-row edge blocks)
over fewer useful rows — k/v DMA amplification 2x / 3x vs 1.5x at
rows=32.  The TWOPASS form (flash-style logit recompute; per-stage
NEUTRAL at 256^2, perf/nat_fwd_ab.py) halves peak VMEM, so 32-row
stripes fit again.  This script measures bare-kernel time per stage and
per (rows, twopass) config, checks parity vs the XLA reference, and
optionally e2e serving at 384/512.

Usage:
  python -u perf/nat_stripe_ab.py                # bare kernel sweep
  python -u perf/nat_stripe_ab.py --e2e 384      # e2e serve, policy default
  LMNET_NAT_STRIPE=16,0 python -u perf/nat_stripe_ab.py --e2e 384  # old
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

ITERS = 20
LADDERS = {
    384: [(48, 48, 96), (96, 96, 48), (192, 192, 24), (384, 384, 12)],
    512: [(64, 64, 96), (128, 128, 48), (256, 256, 24), (512, 512, 12)],
}
BWD_LADDERS = {
    256: [(32, 32, 96), (64, 64, 48), (128, 128, 24), (256, 256, 12)],
    **LADDERS,
}


def _rtt():
    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(())))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"device={jax.devices()[0]} rtt={rtt*1e3:.1f} ms", flush=True)
    return rtt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--e2e", type=int, default=0, choices=[0, 384, 512])
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()
    B = args.batch
    rtt = _rtt()

    if args.e2e:
        from lmnet_tpu.models import LMNet, structural_reparam
        from lmnet_tpu.serve.engine import deploy_forward

        S = args.e2e
        pol = os.environ.get("LMNET_NAT_STRIPE", "default")
        model = LMNet(num_classes=2)
        variables = jax.jit(
            lambda kk: model.init(kk, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(0))
        dv = structural_reparam(variables)
        x = jnp.ones((B, S, S, 3), jnp.bfloat16)

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
        print(f"e2e serve {S}^2 B={B} [{pol}] {best:8.1f} img/s", flush=True)
        return

    from lmnet_tpu.ops import nat as nat_xla
    from lmnet_tpu.ops.pallas import nat_flat as nf

    if args.bwd:
        for size, stages in BWD_LADDERS.items():
            for H, W, C in stages:
                WC = W * C
                kq, kk, kv, kb = jax.random.split(jax.random.key(0), 4)
                q = jax.random.normal(kq, (B, H, WC), jnp.bfloat16)
                k = jax.random.normal(kk, (B, H, WC), jnp.bfloat16)
                v = jax.random.normal(kv, (B, H, WC), jnp.bfloat16)
                rpb = jax.random.normal(kb, (12, 5, 5), jnp.float32) * 0.02

                line = f"bwd {size}^2 stage {H}x{W} C={C}:"
                for ov, name in [
                    ("0,16", "xla-vjp"), ("8,16", "old8"),
                    ("16,64", "r16@64m"), ("32,64", "r32@64m"),
                ]:
                    os.environ["LMNET_NAT_BWD_STRIPE"] = ov

                    def chain(q, k, v, rpb):
                        def loss(q, k, v, rpb):
                            return jnp.sum(
                                nf.nat_flat(q, k, v, rpb, 12, C, W).astype(
                                    jnp.float32
                                )
                            )

                        gfn = jax.grad(loss, argnums=(0, 1, 2, 3))

                        def body(i, acc):
                            dq, dk, dv, db = gfn(
                                q + acc.astype(q.dtype) * 1e-20, k, v, rpb
                            )
                            return acc + dq[0, 0, 0].astype(jnp.float32)

                        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

                    try:
                        g = jax.jit(chain)
                        float(g(q, k, v, rpb))
                    except Exception as e:  # noqa: BLE001
                        line += f"  {name} FAIL({type(e).__name__})"
                        continue
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(g(q, k, v, rpb))
                        best = min(best, (time.perf_counter() - t0 - rtt) / ITERS)
                    line += f"  {name} {best*1e3:7.3f}ms"
                del os.environ["LMNET_NAT_BWD_STRIPE"]
                print(line, flush=True)
        return

    for size, stages in LADDERS.items():
        for H, W, C in stages:
            WC = W * C
            kq, kk, kv, kb = jax.random.split(jax.random.key(0), 4)
            q = jax.random.normal(kq, (B, H, WC), jnp.bfloat16)
            k = jax.random.normal(kk, (B, H, WC), jnp.bfloat16)
            v = jax.random.normal(kv, (B, H, WC), jnp.bfloat16)
            rpb = jax.random.normal(kb, (12, 5, 5), jnp.float32) * 0.02

            Br = min(B, 2)
            ref = nat_xla.neighborhood_attention(
                q[:Br].reshape(Br, H, W, C).astype(jnp.float32),
                k[:Br].reshape(Br, H, W, C).astype(jnp.float32),
                v[:Br].reshape(Br, H, W, C).astype(jnp.float32),
                rpb, 3,
            ).reshape(Br, H, WC)

            configs = (
                [("16,0,16", "old"), ("32,0,64", "h32@64m"), ("32,1,64", "tp32@64m")]
                if WC <= 4608
                else [("8,0,16", "old"), ("32,0,64", "h32@64m"), ("32,1,64", "tp32@64m")]
            )
            line = f"{size}^2 stage {H}x{W} C={C}:"
            for ov, name in configs:
                os.environ["LMNET_NAT_STRIPE"] = ov

                def chain(q, k, v, rpb):
                    def body(i, acc):
                        o = nf.nat_flat(
                            q + acc.astype(q.dtype) * 1e-20, k, v, rpb,
                            12, C, W,
                        )
                        return acc + o[0, 0, 0].astype(jnp.float32)

                    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

                try:
                    g = jax.jit(chain)
                    float(g(q, k, v, rpb))
                except Exception as e:  # noqa: BLE001 — VMEM overflow is a result
                    line += f"  {name} FAIL({type(e).__name__})"
                    continue
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(g(q, k, v, rpb))
                    best = min(best, (time.perf_counter() - t0 - rtt) / ITERS)
                out = jax.jit(
                    lambda q, k, v, rpb: nf.nat_flat(q, k, v, rpb, 12, C, W)
                )(q[:Br], k[:Br], v[:Br], rpb)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
                line += f"  {name} {best*1e3:7.3f}ms(err {err:.0e})"
            del os.environ["LMNET_NAT_STRIPE"]
            print(line, flush=True)


if __name__ == "__main__":
    main()
