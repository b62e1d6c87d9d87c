"""A/B: composing the skip blocks' convl/convm/convs into the fuse conv
(VERDICT r4 ask #4b — skip4 M2 at 7.2 ms leads the 46%-HBM skips bucket;
two stacked same-padded 3x3 convs with no nonlinearity between compose
into one 5x5, so the (B,H,W,cm) intermediates are never materialized).

The composition is interior-exact; the outermost 1-px output ring deviates
(the two-pass form zero-pads the intermediate). This A/B measures BOTH the
deviation (max over the ring + interior) and e2e 256^2 B=128 throughput.
Wiring as default would require a border fix-up — only worth building if
the perf side wins.

Usage: python perf/skip_compose_ab.py
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

    xs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    a = np.asarray(deploy_forward(dv, xs, nat_backend="xla"))
    b = np.asarray(deploy_forward(dv, xs, nat_backend="xla", skip_compose=True))
    d = np.abs(a - b)
    print(f"64^2 f32 logits: max|diff| full {d.max():.3e}  "
          f"interior[4:-4] {d[:, 4:-4, 4:-4].max():.3e}")

    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    x = jnp.ones((128, 256, 256, 3), jnp.bfloat16)

    def rate(flag):
        def chain(x):
            def body(i, acc):
                y = deploy_forward(
                    dv, x + acc.astype(x.dtype) * 1e-20,
                    nat_backend="flat", skip_compose=flag,
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
    comp = rate(True)
    print(f"e2e 256^2 B=128: skip_compose=False {base:.1f} img/s | "
          f"True {comp:.1f} img/s ({100*(comp/base-1):+.1f}%)")


if __name__ == "__main__":
    main()
