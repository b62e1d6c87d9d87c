"""A/B: deploy-time LN-affine folding into qkv/fc1 weights (VERDICT r4 ask
#4a — NATT interiors sit at ~60% HBM; the fold is pure weight math, exact,
and removes the affine multiply-add from the LN chain).

Measures e2e deploy_forward at 256^2 B=128 bf16 with ln_fold off/on, plus a
numerical-equivalence check at small shape.

Usage: python perf/ln_fold_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10


def main():
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    dv = structural_reparam(variables)

    # numerical equivalence at 64^2 f32
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    a = np.asarray(deploy_forward(dv, xs, nat_backend="xla", ln_fold=False))
    b = np.asarray(deploy_forward(dv, xs, nat_backend="xla", ln_fold=True))
    print(f"max |diff| f32 64^2: {np.abs(a - b).max():.3e}")
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    x = jnp.ones((128, 256, 256, 3), jnp.bfloat16)

    def rate(ln_fold):
        def chain(x):
            def body(i, acc):
                y = deploy_forward(
                    dv, x + acc.astype(x.dtype) * 1e-20,
                    nat_backend="flat", ln_fold=ln_fold,
                )
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        g = jax.jit(chain)
        float(g(x))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = max(best, 128 / ((time.perf_counter() - t0 - rtt) / ITERS))
        return best

    base = rate(False)
    fold = rate(True)
    print(f"e2e 256^2 B=128: ln_fold=False {base:.1f} img/s | "
          f"ln_fold=True {fold:.1f} img/s ({100*(fold/base-1):+.1f}%)")


if __name__ == "__main__":
    main()
