"""Sub-component timing of the NATT block at natt4's shape (256^2 x 12):
where do the 21 ms of non-NAT time go?  B=128 bf16."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10


def timeit(name, fn, *args):
    def chain(*a):
        def body(i, acc):
            y = fn(*[x + (acc * 1e-30).astype(x.dtype) if i == 0 else x
                     for i, x in enumerate(a)])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    try:
        float(g(*args))
    except Exception as e:
        print(f"{name:55s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return float("nan")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:55s} {best * 1e3:9.3f} ms")
    return best


def main():
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve import engine as se
    from lmnet_tpu.models.blocks import gelu

    bf16 = jnp.bfloat16
    B, S, C = 128, 256, 12

    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)
    p = deploy_vars["params"]["natt4"]

    x = jnp.ones((B, S, S, C), bf16)
    x3 = jnp.ones((B, S, S, 3 * C), bf16)

    timeit("embed 3x3 conv 12->12", lambda x: se._conv(p["embed"]["proj"], x), x)
    timeit("LN over C=12", lambda x: se._ln(p["norm1"], x), x)
    timeit("qkv dense 12->36", lambda x: se._dense(p["attn"]["qkv"], x), x)
    timeit("split qkv", lambda x3: jnp.split(x3, 3, axis=-1)[0], x3)
    timeit("proj dense 12->12 + residual", lambda x: se._dense(p["attn"]["proj"], x) + x, x)
    timeit("mlp 12->24->12", lambda x: se._mlp(p["mlp"], x), x)
    timeit("residual add", lambda x: x + x, x)
    timeit("gelu 256^2x12", lambda x: gelu(x), x)
    # fused LN+qkv as one XLA region
    timeit("LN+qkv fused region",
           lambda x: se._dense(p["attn"]["qkv"], se._ln(p["norm1"], x)), x)
    # whole non-NAT remainder
    def no_nat(x):
        emb = se._conv(p["embed"]["proj"], x)
        ln1 = se._ln(p["norm1"], emb)
        qkv = se._dense(p["attn"]["qkv"], ln1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = se._dense(p["attn"]["proj"], q * 1.0) + emb
        return se._mlp(p["mlp"], se._ln(p["norm2"], att)) + att

    timeit("natt4 minus NAT (q passthrough)", no_nat, x)
    timeit("natt4 full (flat NAT)", lambda x: se._natt(p, x, 12, "flat"), x)


if __name__ == "__main__":
    main()
