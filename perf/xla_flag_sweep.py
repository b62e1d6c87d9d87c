"""Sweep XLA:TPU backend options against the e2e serving and train benches.

The remote-TPU tunnel's PJRT client rejects TPU-specific XLA_FLAGS at
client startup ("Unknown flag in XLA_FLAGS" — the client binary only
parses generic XLA flags; TPU compilation happens server-side).  Per-jit
``compiler_options`` DO reach the server compiler (bogus option names
fail the compile), so the sweep runs in-process: one jit per config,
fresh compile each (no persistent cache), same chained fori_loop
protocol as bench.py (RTT-corrected, best of reps).

Usage:
  python -u perf/xla_flag_sweep.py             # serve sweep
  python -u perf/xla_flag_sweep.py --train     # train sweep
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

CONFIGS = [
    ("baseline", {}),
    ("vmem24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem32m_lhs", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"}),
]

ITERS = 10
REPS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    from lmnet_tpu.models import LMNet, structural_reparam

    B = 128
    if not args.train:
        from lmnet_tpu.serve.engine import deploy_forward

        m = LMNet(num_classes=2)
        variables = jax.jit(
            lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(0))
        dv = structural_reparam(variables)
        x = jnp.ones((B, 256, 256, 3), jnp.bfloat16)

        def chain(x):
            def body(i, acc):
                y = deploy_forward(dv, x + acc.astype(x.dtype) * 1e-20,
                                   nat_backend="flat")
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        fn, call_args = chain, (x,)
    else:
        from lmnet_tpu.metrics.confusion import ConfusionAccumulator
        from lmnet_tpu.train.engine import create_train_state, train_step

        m = LMNet(num_classes=2, dtype=jnp.bfloat16)
        state = create_train_state(
            m, jax.random.key(0), (1, 64, 64, 3), epochs=200,
            steps_per_epoch=100,
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

            _, acc = jax.lax.fori_loop(0, ITERS, body, (s, jnp.zeros(())))
            return acc

        fn, call_args = chain, (state, xt)

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    results = {}
    for name, opts in CONFIGS:
        g = jax.jit(fn, compiler_options=opts or None)
        try:
            float(jnp.asarray(g(*call_args)).ravel()[0])  # compile + warm
        except Exception as e:  # unknown option / OOM under this config
            results[name] = None
            print(f"{name:24s} FAILED ({type(e).__name__}: {str(e)[:90]})",
                  flush=True)
            continue
        best = 0.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jnp.asarray(g(*call_args)).ravel()[0])
            dt = (time.perf_counter() - t0 - rtt) / ITERS
            best = max(best, B / dt)
        results[name] = round(best, 1)
        print(f"{name:24s} {results[name]} img/s", flush=True)
    print(results)


if __name__ == "__main__":
    main()
