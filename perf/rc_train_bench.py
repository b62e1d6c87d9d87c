"""TPU micro-benchmark: fused train-mode RC branches (ops/pallas/rc_train)
vs the plain-XLA branch graph — fwd and fwd+bwd, at the LM-Net stage shapes.

Run: python perf/rc_train_bench.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp
import numpy as np

from lmnet_tpu.ops.pallas.rc_train import (
    _rc_ref_jnp,
    rc_branch_act,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 30


def timeit(fn, *args):
    fn(*args)  # warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    rng = np.random.RandomState(0)
    # (H, W, C): encoder stage shapes (expand channels), 256^2 ec=24 hottest
    for H, W, C in [(256, 256, 24), (128, 128, 48), (64, 64, 96), (32, 32, 192)]:
        e = jnp.asarray(rng.randn(B, H, W * C), jnp.bfloat16)
        k5 = jnp.asarray(rng.randn(5, 5, 1, C) * 0.1, jnp.float32)
        k3 = jnp.asarray(rng.randn(3, 3, 1, C) * 0.1, jnp.float32)
        kv = jnp.asarray(rng.randn(3, 1, 1, C) * 0.1, jnp.float32)
        kh3 = jnp.asarray(rng.randn(1, 3, 1, C) * 0.1, jnp.float32)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(4, C), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(4, C), jnp.float32)
        args = (e, k5, k3, kv, kh3, gamma, beta)

        @jax.jit
        def fwd_fused(*a):
            t, s, mu, var = rc_branch_act(*a, C, 1e-5, False)
            return jnp.sum(t.astype(jnp.float32)) + jnp.sum(s)

        @jax.jit
        def fwd_ref(*a):
            t, s = _rc_ref_jnp(*a, C, 1e-5)
            return jnp.sum(t.astype(jnp.float32)) + jnp.sum(s)

        g_fused = jax.jit(jax.grad(lambda *a: fwd_fused(*a), argnums=(0, 1, 5)))
        g_ref = jax.jit(jax.grad(lambda *a: fwd_ref(*a), argnums=(0, 1, 5)))

        tf = timeit(fwd_fused, *args) * 1e3
        tr = timeit(fwd_ref, *args) * 1e3
        tgf = timeit(g_fused, *args) * 1e3
        tgr = timeit(g_ref, *args) * 1e3
        # value sanity on device
        vf = float(fwd_fused(*args))
        vr = float(fwd_ref(*args))
        print(
            f"{H}x{W} C={C}: fwd fused {tf:7.2f} ms vs xla {tr:7.2f} | "
            f"fwd+bwd fused {tgf:7.2f} vs xla {tgr:7.2f} | "
            f"value rel diff {abs(vf - vr) / max(abs(vr), 1e-9):.2e}"
        )


if __name__ == "__main__":
    main()
