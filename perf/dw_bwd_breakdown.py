"""Isolate the depthwise-conv backward: fwd vs dgrad vs wgrad at the RC
train shapes (round-5 train-roofline follow-up).

The train roofline leaves the RC bucket at ~25% VPU / 28% HBM with the
claim that the residue is XLA's lowering efficiency for depthwise
BACKWARD passes. This measures the three pieces separately per shape:

  fwd    y  = dw5x5(x)                    (the round-2 xplane's ~73%-VPU op)
  dgrad  dx = vjp wrt x   (a dw5x5 correlation — same structure as fwd)
  wgrad  dk = vjp wrt k   (a (B*H*W)-deep reduction per tap — the suspect)

Usage: python perf/dw_bwd_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10


def host_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.zeros(())))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.zeros(())))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args, rtt=0.0):
    def chain(*a):
        def body(i, acc):
            return acc + fn(a[0] + (acc * 1e-30).astype(a[0].dtype), *a[1:])

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    float(g(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
    return best


def dw(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def main():
    rtt = host_rtt()
    print(f"RTT {rtt*1e3:.2f} ms")
    B = 128
    for ec, S in ((24, 256), (48, 128), (96, 64), (192, 32)):
        x = jnp.ones((B, S, S, ec), jnp.bfloat16)
        k = jnp.ones((5, 5, 1, ec), jnp.bfloat16) * 0.04
        g = jnp.ones((B, S, S, ec), jnp.bfloat16)

        _, vjp = jax.vjp(lambda x, k: dw(x, k), x, k)

        t_fwd = timeit(lambda x: jnp.sum(dw(x, k)).astype(jnp.float32), x, rtt=rtt)
        t_dgrad = timeit(
            lambda g: jnp.sum(vjp(g)[0]).astype(jnp.float32), g, rtt=rtt
        )
        t_wgrad = timeit(
            lambda g: jnp.sum(vjp(g)[1]).astype(jnp.float32), g, rtt=rtt
        )
        px = B * S * S
        vops = px * ec * 50  # 25 taps x 2
        eff = lambda t: 100 * vops / t / 6.1e12 if t > 0 else 0  # noqa: E731
        print(f"dw5x5 {S:3d}^2 ec={ec:3d}: fwd {t_fwd*1e3:7.3f} ms "
              f"({eff(t_fwd):4.1f}%VPU) | dgrad {t_dgrad*1e3:7.3f} "
              f"({eff(t_dgrad):4.1f}%) | wgrad {t_wgrad*1e3:7.3f} "
              f"({eff(t_wgrad):4.1f}%)")


if __name__ == "__main__":
    main()
