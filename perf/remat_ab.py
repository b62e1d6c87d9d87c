"""TPU A/B: full train-step throughput vs the --rc_remat policy.

Measures the e2e train step (fwd + loss + bwd + AdamW + BN + confusion,
bf16 compute) at 256^2 for rc_remat in {False, True, 'branches'} at B=128,
then re-sweeps larger batches under the winning policy (remat frees the
HBM that made B=160/192 OOM without it -- ROADMAP item 2a).

Run: python -u perf/remat_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp

ITERS = 10


def measure(rc_remat, batch):
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import create_train_state, train_step

    model = LMNet(num_classes=2, dtype=jnp.bfloat16, rc_remat=rc_remat)
    state = create_train_state(
        model, jax.random.key(0), (1, 64, 64, 3), epochs=200, steps_per_epoch=100
    )
    xt = jnp.ones((batch, 256, 256, 3), jnp.float32)
    yt = jnp.zeros((batch, 256, 256), jnp.int32)
    key = jax.random.key(1)
    cm0 = ConfusionAccumulator.init(2)

    def chain(s, x):
        def body(i, carry):
            s, acc = carry
            s, loss, _ = train_step.__wrapped__(s, x, yt, key, cm0)
            return s, acc + loss

        _, acc = jax.lax.fori_loop(0, ITERS, body, (s, jnp.zeros(())))
        return acc

    g = jax.jit(chain)
    try:
        float(g(state, xt))  # compile + warm
    except Exception as e:  # noqa: BLE001 -- OOM at large batch is a result
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(state, xt))
        best = max(best, batch / ((time.perf_counter() - t0) / ITERS))
    return best, None


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    pol_arg = sys.argv[1] if len(sys.argv) > 1 else "true"
    pol = {"true": True, "false": False}.get(pol_arg.lower(), pol_arg)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    t0 = time.perf_counter()
    r, err = measure(pol, batch)
    dt = time.perf_counter() - t0
    print(
        f"rc_remat={pol!r:12} B={batch}: "
        + (f"{r:7.1f} img/s" if r else f"FAIL {err}")
        + f"   [{dt:.0f}s incl compile]",
        flush=True,
    )


if __name__ == "__main__":
    main()
