"""TPU: high-resolution TRAIN throughput (384^2 / 512^2) — capability + ledger.

The 384/512 serving configs are benched every round (BASELINE configs 3/4),
but training at those resolutions was never measured.  With the round-4 NAT
bwd stripe lift (fused path covers WC=6144) and the natt_remat fit-lever,
the full train step (fwd + CE/Dice + bwd + AdamW + BN + confusion, bf16)
should compile at 384^2/512^2.  Pixel-equivalent batches to 256^2 B=128 are
384^2 B~56 and 512^2 B=32; pow2 batches only (non-pow2 tilings lose 30-45%,
see BASELINE.md).

For each (size, batch): try natt_remat=False first, fall back to True on
compile OOM — recording WHICH config fits is the point.

Run: python -u perf/train_hires.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH overrides break axon discovery

import jax
import jax.numpy as jnp

ITERS = 10


def measure(size, batch, natt_remat):
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import create_train_state, train_step

    model = LMNet(
        num_classes=2, dtype=jnp.bfloat16, rc_remat=True, natt_remat=natt_remat
    )
    state = create_train_state(
        model, jax.random.key(0), (1, 64, 64, 3), epochs=200, steps_per_epoch=100
    )
    xt = jnp.ones((batch, size, size, 3), jnp.float32)
    yt = jnp.zeros((batch, size, size), jnp.int32)
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
    except Exception as e:  # noqa: BLE001 -- OOM is a result here
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
    for size, batch in [(384, 64), (384, 32), (512, 32), (512, 16)]:
        for natt_remat in (False, True):
            rate, err = measure(size, batch, natt_remat)
            tag = f"{size}^2 B={batch} natt_remat={natt_remat}"
            if err:
                # Only an OOM justifies retrying with the remat fit-lever;
                # any other failure is a bug in the non-remat path and must
                # surface as such, not be recorded as "needs remat to fit".
                # The remote-compile helper reports HBM OOM as an opaque
                # "HTTP 500: tpu_compile_helper subprocess exit code 1"
                # (round-3 ledger: B=160/192 OOMs presented exactly this
                # way) — treat that as likely-OOM but tag it distinctly so
                # a genuine compiler bug is still visible in the output.
                low = err.lower()
                oom = any(
                    s in low
                    for s in ("resource_exhausted", "resource exhausted", "out of memory", "oom")
                )
                helper = "tpu_compile_helper" in err or "remote_compile" in err
                kind = "OOM" if oom else (
                    "REMOTE-COMPILE FAIL, likely OOM" if helper else "NON-OOM BUG"
                )
                print(f"{tag}: FAIL ({kind}) {err}", flush=True)
                if oom or helper:
                    continue  # try the remat fallback
                break  # real bug — do not mask it behind the remat path
            print(f"{tag}: {rate:.1f} img/s", flush=True)
            break  # fits without (or with) the lever — done for this config


if __name__ == "__main__":
    main()
