"""A/B: weight-sliced vs fused qkv under TRAIN (fwd+bwd), 256^2 C=12 B=128.

The round-2 SERVE ledger showed weight-sliced qkv (3 matmuls) beats the
fused (.., 3C) matmul + split by ~7 ms e2e — splitting a fused output
costs real copies. Training adds a backward: the sliced form pays 3
wgrads + 3 dgrads vs 1 each for the fused form, so the winner could
reverse. This measures the isolated qkv(LN(x)) stage fwd+bwd both ways
at the hottest NATT shape (the train roofline's biggest single line).

Usage: python perf/qkv_train_ab.py
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


def main():
    rtt = host_rtt()
    print(f"RTT {rtt*1e3:.2f} ms")
    for C, S in ((12, 256), (24, 128), (96, 32)):
        B = 128
        x = jnp.ones((B, S, S, C), jnp.bfloat16)
        w = jnp.ones((C, 3 * C), jnp.bfloat16) * 0.1
        b = jnp.zeros((3 * C,), jnp.bfloat16)

        def qkv_sliced(x, w, b):
            def f(w):
                q = x @ w[:, :C] + b[:C]
                k = x @ w[:, C : 2 * C] + b[C : 2 * C]
                v = x @ w[:, 2 * C :] + b[2 * C :]
                # consumer stand-in keeping all three live (sum into f32)
                return jnp.sum((q * k + v).astype(jnp.float32))

            l, g = jax.value_and_grad(f)(w)
            return l + jnp.sum(g).astype(jnp.float32)

        def qkv_fused(x, w, b):
            def f(w):
                qkv = x @ w + b
                q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
                return jnp.sum((q * k + v).astype(jnp.float32))

            l, g = jax.value_and_grad(f)(w)
            return l + jnp.sum(g).astype(jnp.float32)

        ts = timeit(qkv_sliced, x, w, b, rtt=rtt)
        tf = timeit(qkv_fused, x, w, b, rtt=rtt)
        print(f"{S:3d}^2 C={C:3d} B={B}: sliced fwd+bwd {ts*1e3:7.3f} ms | "
              f"fused {tf*1e3:7.3f} ms ({100*(tf/ts-1):+.1f}% fused vs sliced)")


if __name__ == "__main__":
    main()
