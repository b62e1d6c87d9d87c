"""Round-2 focused perf probes (run on TPU):
  1. NATT blocks with the flat NAT backend at B=128
  2. full-model batch sweep around 128
  3. dw5x5 flat kernel: bf16 accumulate vs fp32 accumulate
"""

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

    bf16 = jnp.bfloat16
    B, S = 128, 256
    f = (12, 24, 48, 96, 192)

    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)
    p = deploy_vars["params"]

    # 1. NATT blocks, flat backend
    for name, dim, scale in (("natt1", f[3], S // 8), ("natt2", f[2], S // 4),
                             ("natt3", f[1], S // 2), ("natt4", f[0], S)):
        h = jnp.ones((B, scale, scale, dim), bf16)
        timeit(
            f"NATT block {name} {scale}x{scale}x{dim} (flat)",
            lambda h, name=name: se._natt(p[name], h, 12, "flat"), h,
        )
        # bare flat NAT op
        from lmnet_tpu.ops.pallas.nat_flat import nat_flat
        q = jnp.ones((B, scale, scale * dim), bf16)
        rpb = jnp.zeros((12, 5, 5), jnp.float32)
        timeit(
            f"bare NAT flat {scale}x{scale}x{dim}",
            lambda q, rpb=rpb, dim=dim, scale=scale: nat_flat(
                q, q, q, rpb, 12, dim, scale
            ),
            q,
        )

    # 2. batch sweep on the full deploy model (flat NAT, default path)
    model = LMNet(num_classes=2, deploy=True, dtype=bf16)
    for bb in (96, 128, 160, 192):
        x = jnp.ones((bb, S, S, 3), bf16)
        t = timeit(
            f"model.apply deploy flat-NAT B={bb}",
            lambda x: model.apply(deploy_vars, x, train=False), x,
        )
        if t == t:
            print(f"{'':55s} -> {bb / t:9.1f} img/s")

    # 3. dw kernel accumulate dtype probe
    from lmnet_tpu.ops.pallas.rc_flat import _flat_weights, dw_gelu_flat

    C, H = 24, 256
    e = jnp.ones((B, H, H * C), bf16)
    kd = jnp.asarray(
        jax.random.normal(jax.random.key(1), (5, 5, 1, C), jnp.float32) * 0.1
    )
    wf = _flat_weights(kd, H)
    bf_ = jnp.zeros((H * C,), jnp.float32)
    timeit("dw_gelu_flat fp32-acc 256^2x24", lambda e: dw_gelu_flat(e, wf, bf_, C)[0], e)
    wfb = wf.astype(bf16)
    bfb = bf_.astype(bf16)
    timeit("dw_gelu_flat bf16-acc 256^2x24",
           lambda e: dw_gelu_flat(e, wfb, bfb, C)[0], e)


if __name__ == "__main__":
    main()
