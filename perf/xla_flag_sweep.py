"""Sweep XLA:TPU backend flags against the e2e serving and train benches.

XLA_FLAGS must be set before backend init, so each config runs in a fresh
subprocess.  The worker times the same chained fori_loop protocol as
bench.py (RTT-corrected, best of reps).

Usage:
  python perf/xla_flag_sweep.py             # serve sweep
  python perf/xla_flag_sweep.py --train     # train sweep
  python perf/xla_flag_sweep.py --worker "<flags>" [--train]   # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("no_multi_level_fusion", "--xla_tpu_rwb_fusion=false"),
]


def worker(flags: str, train: bool) -> None:
    if flags:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flags
        ).strip()
    import time

    import jax
    import jax.numpy as jnp

    # NOTE: no persistent compile cache — flag configs must compile fresh
    from lmnet_tpu.models import LMNet, structural_reparam

    ITERS = 10
    if not train:
        from lmnet_tpu.serve.engine import deploy_forward

        B = 128
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

        g = jax.jit(chain)
        args = (x,)
    else:
        from lmnet_tpu.metrics.confusion import ConfusionAccumulator
        from lmnet_tpu.train.engine import create_train_state, train_step

        B = 128
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

        g = jax.jit(chain)
        args = (state, xt)

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    float(jnp.asarray(g(*args)).ravel()[0])  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(g(*args)).ravel()[0])
        dt = (time.perf_counter() - t0 - rtt) / ITERS
        best = max(best, B / dt)
    print(f"RESULT {best:.1f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--worker", default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.train)
        return
    results = {}
    for name, flags in CONFIGS:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", flags]
        if args.train:
            cmd.append("--train")
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1200, cwd=REPO
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            results[name] = float(line[-1].split()[1]) if line else None
            if not line:
                sys.stderr.write(f"-- {name} failed:\n{out.stderr[-2000:]}\n")
        except subprocess.TimeoutExpired:
            results[name] = None
        print(f"{name:24s} {results[name]} img/s", flush=True)
    print(results)


if __name__ == "__main__":
    main()
