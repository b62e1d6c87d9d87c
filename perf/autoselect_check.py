"""Exercise the serve-time backend autotune on real TPU: run
``serve.engine.autoselect_backends`` at the three BASELINE serving
configs and print the measured per-combo timings plus the winner.

Purpose: (a) an end-to-end check that the 'auto' path (extra compiles,
candidate skipping, caching) works on hardware, (b) a record of which
backend pair wins at each size — the static defaults were only ever
measured at 256².  Run: python -u perf/autoselect_check.py [sizes...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {256: 128, 384: 32, 512: 16}  # size -> serving batch (BASELINE)


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve import engine

    sizes = [int(a) for a in sys.argv[1:]] or list(CONFIGS)
    m = LMNet()
    vs = jax.jit(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False))(
        jax.random.key(0)
    )
    dv = structural_reparam(vs)
    for size in sizes:
        B = CONFIGS.get(size, 32)
        x = jnp.asarray(
            np.random.RandomState(0).rand(B, size, size, 3), jnp.bfloat16
        )

        # the autotune's own timer, instrumented to capture the full table
        timings = {}

        def spy_time(rc, nat, _x=x, _t=timings):
            import time as _time

            run = lambda: engine.deploy_forward(
                dv, _x, num_heads=12, nat_backend=nat, rc_backend=rc
            )
            run().block_until_ready()
            t0 = _time.perf_counter()
            out = None
            for _ in range(10):
                out = run()
            out.block_until_ready()
            dt = (_time.perf_counter() - t0) / 10
            _t[(rc, nat)] = dt
            return dt

        engine._AUTOTUNE_CACHE.clear()
        choice = engine.autoselect_backends(dv, x, time_fn=spy_time)
        print(f"--- {size}^2 B={B} ---")
        for (rc, nat), dt in sorted(timings.items(), key=lambda kv: kv[1]):
            print(f"  rc={rc:5s} nat={nat:5s}  {dt * 1e3:7.2f} ms/step "
                  f"({B / dt:7.1f} img/s)")
        print(f"  winner: rc={choice[0]} nat={choice[1]}")


if __name__ == "__main__":
    main()
