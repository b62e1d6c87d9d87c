"""TPU A/B: packed grouped-conv train RC vs the 4-branch XLA graph.

VERDICT r3 ask #6: pack the 4 depthwise branches (5x5/3x3/3x1/1x3) as ONE
grouped conv — zero-pad into 5x5, stack on the output channel, one pass
over the expanded activation — and measure the full train step e2e at
B=128 (fwd + loss + bwd + AdamW + BN + confusion, bf16, rc_remat=True).

Run: python -u perf/rc_packed_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp

ITERS = 10


def measure(backend, batch=128):
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import create_train_state, train_step

    model = LMNet(
        num_classes=2, dtype=jnp.bfloat16, rc_train_backend=backend
    )
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
        float(g(state, xt))
    except Exception as e:  # noqa: BLE001
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
    for backend in ("auto", "packed"):
        rate, err = measure(backend)
        if rate is None:
            print(f"train B=128 rc_train_backend={backend}: FAILED ({err})",
                  flush=True)
        else:
            print(f"train B=128 rc_train_backend={backend}: {rate:6.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
