"""TPU A/B: flat-layout Pallas 2x upsample vs the einsum formulation.

SETTLED NEGATIVE (round 4, see BASELINE.md ledger). Measured on v5e:

  stage (bf16)  fwd flat / einsum     fwd+bwd flat / einsum
  32^2  C96       0.002 /  0.814        2.971 /  0.878   ms
  64^2  C48       1.399 /  0.055        3.436 /  1.679   ms
  128^2 C24       3.729 /  0.178        8.768 /  2.433   ms
  256^2 C12      10.995 /  0.399       18.262 /  2.829   ms
  e2e serve 256^2 B=128: einsum 1344.5 / flat 1301.1 img/s (-3.2%)

Two findings: the einsum upsample is nearly free in isolation (the
xplane "up4 = 4 ms" line was fused neighbors, not the upsample), and
the kernel's W-phase dup ladder (log2(W)+1 cross-lane rolls, Mosaic has
no lane reshape) costs more than everything it saves.  The skips
bucket's sub-50% HBM number is not an upsample problem.

The roofline table puts the skips/GFT/resizes bucket at ~46% of HBM peak
(BASELINE.md); inside it, the decoder upsamples were suspected of paying
hidden (B,H,C,W) layout copies around the W-contraction einsum.
ops/pallas/upsample_flat.py reformulates the exactly-2x
align_corners=True case as per-phase shifted lane blends on the network's
flat (B, H, W*C) rows — no relayouts, H-phase interleave free via an
output view.

Isolated timings run both formulations in-process at the decoder ladder
shapes; e2e goes through the env knob (fresh process per config):

  python -u perf/upsample_flat_ab.py                 # isolated fwd / fwd+bwd
  LMNET_UPSAMPLE_BACKEND=flat python -u perf/upsample_flat_ab.py --e2e
  LMNET_UPSAMPLE_BACKEND=einsum python -u perf/upsample_flat_ab.py --e2e
  ... --e2e --train                                  # train step instead
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
# decoder ladder at 256^2 serving (deep -> shallow)
STAGES = [(32, 32, 96), (64, 64, 48), (128, 128, 24), (256, 256, 12)]


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


def _chain_time(fn, x, rtt, iters=ITERS):
    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x + acc.astype(x.dtype) * 1e-20)
            return acc + y[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best * 1e3


def _chain_time_grad(fn, x, rtt, iters=ITERS):
    def loss(x):
        return jnp.sum(fn(x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)

    @jax.jit
    def run(x):
        def body(i, acc):
            gx = g(x + acc.astype(x.dtype) * 1e-20)
            return acc + gx[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    B = args.batch
    rtt = _rtt()

    if not args.e2e:
        from lmnet_tpu.ops.pallas.upsample_flat import upsample2x_flat
        from lmnet_tpu.ops.resize import bilinear_resize

        def einsum_up(x):
            _, h, w, _ = x.shape
            return bilinear_resize(x, (2 * h, 2 * w), align_corners=True)

        for H, W, C in STAGES:
            x = jax.random.normal(
                jax.random.key(0), (B, H, W, C), jnp.bfloat16
            )
            # correctness first
            y1 = jax.jit(upsample2x_flat)(x)
            y2 = jax.jit(einsum_up)(x)
            err = float(
                jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))
            )
            tf = _chain_time(upsample2x_flat, x, rtt)
            te = _chain_time(einsum_up, x, rtt)
            tfg = _chain_time_grad(upsample2x_flat, x, rtt)
            teg = _chain_time_grad(einsum_up, x, rtt)
            print(
                f"stage {H:3d}x{W:<3d} C={C:<3d} fwd: flat {tf:6.3f} "
                f"einsum {te:6.3f} ms | fwd+bwd: flat {tfg:6.3f} "
                f"einsum {teg:6.3f} ms | maxerr={err:.2e}",
                flush=True,
            )
        return

    backend = os.environ.get("LMNET_UPSAMPLE_BACKEND", "einsum")
    if args.train:
        from lmnet_tpu.metrics.confusion import ConfusionAccumulator
        from lmnet_tpu.models import LMNet
        from lmnet_tpu.train.engine import create_train_state, train_step

        model = LMNet(num_classes=2, dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.key(0), (1, 64, 64, 3),
            epochs=200, steps_per_epoch=100,
        )
        xt = jnp.ones((B, 256, 256, 3), jnp.float32)
        yt = jnp.zeros((B, 256, 256), jnp.int32)
        key = jax.random.key(1)
        cm0 = ConfusionAccumulator.init(2)

        def chain(s, x):
            def body(i, carry):
                s, acc = carry
                s, loss, _ = train_step.__wrapped__(s, x, yt, key, cm0)
                return s, acc + loss

            _, acc = jax.lax.fori_loop(0, 10, body, (s, jnp.zeros(())))
            return acc

        g = jax.jit(chain)
        float(g(state, xt))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(state, xt))
            best = max(best, B / ((time.perf_counter() - t0 - rtt) / 10))
        print(f"e2e train [{backend}] {best:8.1f} img/s", flush=True)
    else:
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
        print(f"e2e serve [{backend}] {best:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
