"""TPU A/B: widen remat to the NATT blocks -> does train B=256 fit & win?

Round-4 follow-up on the train ledger (BASELINE.md): with rc_remat=True the
batch sweep gave B=128 -> ~197 img/s and B=192/256 OOM at compile.  The four
NeighborhoodTransformer blocks are the OTHER large residual holders (at
256^2xC=12 and B=256, each block keeps ~10 bf16 (B,H,W,C) tensors ~400 MB
each for autodiff).  natt_remat=True recomputes each block from its skip
input, keeping one residual instead.  Sweep:

    (natt_remat, batch) in {(False,128), (True,128), (True,256), (True,192)}

Run: python -u perf/remat_wide_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp

ITERS = 10


def measure(natt_remat, batch):
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import create_train_state, train_step

    model = LMNet(
        num_classes=2, dtype=jnp.bfloat16, rc_remat=True, natt_remat=natt_remat
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
        float(g(state, xt))  # compile + warm
    except Exception as e:  # noqa: BLE001 -- OOM at large batch is a result
        return None, f"{type(e).__name__}: {str(e)[:140]}"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(state, xt))
        best = max(best, batch / ((time.perf_counter() - t0) / ITERS))
    return best, None


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for natt_remat, batch in [(False, 128), (True, 128), (True, 256), (True, 192)]:
        rate, err = measure(natt_remat, batch)
        if err:
            print(f"natt_remat={natt_remat} B={batch}: FAIL {err}", flush=True)
        else:
            print(f"natt_remat={natt_remat} B={batch}: {rate:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
