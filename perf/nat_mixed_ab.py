"""Per-layer NAT backend mix A/B (roofline follow-up, round 4).

The roofline (perf/roofline_r4.log) shows the flat kernel's isolated time is
nearly FLAT across NAT stages (2.7 / 3.0 / 3.6 / 4.2 ms at 32^2C96 ..
256^2C12) while per-stage vector work varies ~6x: the deep stages (hd=8/4)
pay 2*log2(hd) cross-lane rolls per tap in the segment trees, putting them
at ~5x their VPU op floor. The XLA formulation mixes channels on full NHWC
lanes (C=96 -> 75% lane occupancy) with no segment trees; prior rounds only
A/B'd GLOBAL flat-vs-xla (flat won, driven by the high-res stages where
hd=1 makes the trees free). This sweeps MIXED per-stage assignments e2e.

Usage: python perf/nat_mixed_ab.py [--batch 128] [--size 256]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    B, S = args.batch, args.size

    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    dv = structural_reparam(variables)

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(())))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"device={jax.devices()[0]} rtt={rtt*1e3:.1f} ms", flush=True)

    x = jnp.ones((B, S, S, 3), jnp.bfloat16)

    def rate(nat_backend):
        def chain(x):
            def body(i, acc):
                y = deploy_forward(
                    dv, x + acc.astype(x.dtype) * 1e-20, nat_backend=nat_backend
                )
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        g = jax.jit(chain)
        float(g(x))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = max(best, B / ((time.perf_counter() - t0 - rtt) / ITERS))
        return best

    # stage order: natt1 (deepest, hd=8) .. natt4 (highest-res, hd=1).
    # High-res stages stay flat (global xla already measured ~6x slower
    # there, round 1); sweep xla on the two deep stages + all-flat/all-xla
    # anchors.
    mixes = [("flat",) * 4, ("xla",) * 4] + [
        (b1, b2, "flat", "flat")
        for b1, b2 in itertools.product(("flat", "xla"), repeat=2)
        if (b1, b2) != ("flat", "flat")
    ] + [("xla", "xla", "xla", "flat")]
    for mix in mixes:
        r = rate(mix)
        print(f"  {'/'.join(mix):28s} {r:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
