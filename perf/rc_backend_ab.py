"""TPU e2e A/B: serving rc_backend='xla' vs 'flat' (rc_flat fused
dw5x5+gelu+SE-sums kernel) through the full deploy_forward graph.

Round 2 only ever measured the two-phase rc_kernel (slower than XLA);
rc_flat was perf-script inventory. This settles whether the flat kernel
earns the serving default.  Run: python -u perf/rc_backend_ab.py [B] [ITERS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    m = LMNet()
    rng = jax.random.key(0)
    x_init = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    vs = jax.jit(lambda k: m.init(k, x_init, train=False))(rng)
    dv = structural_reparam(vs)
    xs = jnp.asarray(np.random.RandomState(0).rand(B, SIZE, SIZE, 3), jnp.bfloat16)

    for backend in ("xla", "flat"):
        def chain(x):
            def body(i, acc):
                y = deploy_forward(
                    dv, x + acc.astype(x.dtype) * 1e-20,
                    nat_backend="flat", rc_backend=backend,
                )
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        g = jax.jit(chain)
        float(g(xs))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(xs))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(
            f"rc_backend={backend}: {best * 1e3:7.2f} ms/batch "
            f"= {B / best:7.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
