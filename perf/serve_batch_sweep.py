"""Serving batch sweep at the larger resolutions (BASELINE configs 3/4).

256^2 was swept in round 3 (B=128 optimal; 192 catastrophic, 256 -5%),
but 384^2 and 512^2 only ever ran at the BASELINE protocol batches
(32 / 16). At 512^2 the per-image rate is ~4x below pixel-linear
scaling from 256^2 — if that is batch-efficiency (NAT grid / MXU
utilization at B=16), larger batches close it for free.

Run: python -u perf/serve_batch_sweep.py [SIZE ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

SWEEPS = {384: (16, 32, 64, 96), 512: (8, 16, 32, 48)}
ITERS = 10


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    m = LMNet()
    variables = jax.jit(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    sizes = [int(a) for a in sys.argv[1:]] or list(SWEEPS)
    for size in sizes:
        for batch in SWEEPS[size]:
            x = jnp.ones((batch, size, size, 3), jnp.bfloat16)

            def chain(x):
                def body(i, acc):
                    y = deploy_forward(
                        deploy_vars, x + acc.astype(x.dtype) * 1e-20,
                        nat_backend="flat",
                    )
                    return acc + jnp.sum(y)

                return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

            g = jax.jit(chain)
            try:
                float(g(x))  # compile + warm
            except Exception as e:
                print(f"serve {size}^2 B={batch}: FAILED "
                      f"({type(e).__name__}: {str(e)[:90]})", flush=True)
                continue
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(x))
                best = max(best, batch / ((time.perf_counter() - t0 - rtt) / ITERS))
            print(f"serve {size}^2 B={batch}: {best:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
