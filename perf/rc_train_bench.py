"""TPU micro-benchmark: fused train-mode RC branches (ops/pallas/rc_train)
vs the plain-XLA branch graph — fwd and fwd+bwd, at the LM-Net stage shapes.

Iterations are chained on-device (tunnel RTT ~27 ms would otherwise
dominate).  Run: python -u perf/rc_train_bench.py [B] [ITERS]
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def chain_time(make_step, x0):
    """Time ITERS chained applications of make_step (data-dependent)."""

    @jax.jit
    def run(x):
        def body(i, carry):
            return carry * 0.999 + make_step(carry)

        return jax.lax.fori_loop(0, ITERS, body, x)

    jax.block_until_ready(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.ops.pallas.rc_train import _rc_ref_jnp, rc_branch_act

    rng = np.random.RandomState(0)
    for H, W, C in [(256, 256, 24), (128, 128, 48), (64, 64, 96), (32, 32, 192)]:
        e0 = jnp.asarray(rng.randn(B, H, W * C) * 0.1, jnp.bfloat16)
        k5 = jnp.asarray(rng.randn(5, 5, 1, C) * 0.1, jnp.float32)
        k3 = jnp.asarray(rng.randn(3, 3, 1, C) * 0.1, jnp.float32)
        kv = jnp.asarray(rng.randn(3, 1, 1, C) * 0.1, jnp.float32)
        kh3 = jnp.asarray(rng.randn(1, 3, 1, C) * 0.1, jnp.float32)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(4, C), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(4, C), jnp.float32)

        def fused_fwd(x):
            t, s, mu, var = rc_branch_act(x, k5, k3, kv, kh3, gamma, beta, C, 1e-5, False)
            return t

        def ref_fwd(x):
            t, s = _rc_ref_jnp(x, k5, k3, kv, kh3, gamma, beta, C, 1e-5)
            return t

        def grad_step(f):
            def step(x):
                return jax.grad(
                    lambda xx: jnp.sum(f(xx).astype(jnp.float32) ** 2) * 1e-6
                )(x).astype(x.dtype)

            return step

        tf = chain_time(fused_fwd, e0)
        tr = chain_time(ref_fwd, e0)
        print(f"{H}x{W} C={C}: fwd   fused {tf:7.2f} ms  xla {tr:7.2f} ms", flush=True)
        tgf = chain_time(grad_step(fused_fwd), e0)
        tgr = chain_time(grad_step(ref_fwd), e0)
        print(f"{H}x{W} C={C}: f+bwd fused {tgf:7.2f} ms  xla {tgr:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
