"""Benchmark: LM-Net TPU inference throughput (images/sec/chip @ 256x256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: deploy-mode (structurally re-parameterized) LM-Net with the fused
Pallas NAT kernel, bf16 compute, batch 64, steady-state timing — the serving
configuration the north-star targets (BASELINE.json: ">=5x A100 inference
images/sec/chip on v5e").

Methodology notes:
  * iterations are CHAINED INSIDE one XLA program (lax.fori_loop with a
    data dependency) and a single scalar is read back — per-call host
    round-trips through the remote-TPU tunnel measure ~25 ms and would
    otherwise dominate;
  * params are initialized at 64x64 (they are size-independent) to keep
    the one-off compile small.

``vs_baseline``: the reference publishes no machine-readable numbers
(BASELINE.md), so the denominator is a documented estimate of the PyTorch
reference's A100 inference throughput, A100_EST_IMG_S below.  The target is
therefore vs_baseline >= 5.0.
"""

import json
import time

import jax
import jax.numpy as jnp

# Documented assumption (see BASELINE.md): PyTorch LM-Net (4.7M params,
# NATTEN CUDA op at 256^2 with head_dim 1-8, fp16) single-A100 inference
# estimate at 256x256.
A100_EST_IMG_S = 1500.0

BATCH = 128  # measured optimum: B=64 leaves ~40% throughput on the table
TRAIN_BATCH = 128  # measured optimum (rc_remat=True): B=96 -> 153, B=128 -> 197,
                   # B=160 -> 101 (non-pow2 tilings); B=192/256 OOM at compile
ITERS = 10
REPS = 3


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)

    # tunnel round-trip estimate
    f0 = jax.jit(lambda z: z + 1.0)
    float(f0(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f0(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 10

    x = jnp.ones((BATCH, 256, 256, 3), jnp.bfloat16)

    def chain(x):
        def body(i, acc):
            # serving engine: measured faster than flax apply (1341 vs
            # 1331 img/s) once its SE-weight dtype leak was fixed
            y = deploy_forward(
                deploy_vars, x + acc.astype(x.dtype) * 1e-20, nat_backend="flat"
            )
            return acc + jnp.sum(y)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    g = jax.jit(chain)
    float(g(x))  # compile + warm
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(g(x))
        dt = (time.perf_counter() - t0 - rtt) / ITERS
        best = max(best, BATCH / dt)

    # --- train throughput (north star reads "train + infer") -------------
    # Full train step: fwd + CE/Dice + bwd + AdamW + BN + confusion, bf16
    # compute policy (the CLI's --apm path), batch TRAIN_BATCH.
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.train.engine import create_train_state, train_step

    bf_model = LMNet(num_classes=2, dtype=jnp.bfloat16)
    state = create_train_state(
        bf_model, jax.random.key(0), (1, 64, 64, 3),
        epochs=200, steps_per_epoch=100,
    )
    xt = jnp.ones((TRAIN_BATCH, 256, 256, 3), jnp.float32)
    yt = jnp.zeros((TRAIN_BATCH, 256, 256), jnp.int32)
    key = jax.random.key(1)
    cm0 = ConfusionAccumulator.init(2)

    def train_chain(s, x):
        def body(i, carry):
            s, acc = carry
            s, loss, _ = train_step.__wrapped__(s, x, yt, key, cm0)
            return s, acc + loss
        _, acc = jax.lax.fori_loop(0, ITERS, body, (s, jnp.zeros(())))
        return acc

    gt = jax.jit(train_chain)
    float(gt(state, xt))  # compile + warm
    train_best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(gt(state, xt))
        dt = (time.perf_counter() - t0 - rtt) / ITERS
        train_best = max(train_best, TRAIN_BATCH / dt)

    # --- larger-resolution serving configs (BASELINE configs 3/4) --------
    # recorded every round so perf regressions at 384/512 stay visible
    def serve_rate(size, batch):
        xs = jnp.ones((batch, size, size, 3), jnp.bfloat16)

        def chain_s(x):
            def body(i, acc):
                y = deploy_forward(
                    deploy_vars, x + acc.astype(x.dtype) * 1e-20,
                    nat_backend="flat",
                )
                return acc + jnp.sum(y)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        gs = jax.jit(chain_s)
        float(gs(xs))  # compile + warm
        r = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            float(gs(xs))
            r = max(r, batch / ((time.perf_counter() - t0 - rtt) / ITERS))
        return round(r, 1)

    # round-4 batch sweep (perf/serve_batch_sweep.py, BASELINE.md): the
    # round-1 protocol batches (32/16) were the whole 384/512 "efficiency
    # gap" — B=128 is optimal at BOTH sizes (384²: 32->191, 128->563;
    # 512²: 16->80, 128->298; non-pow2 batches 160/192 degrade ~40%)
    img_s_384 = serve_rate(384, 128)
    img_s_512 = serve_rate(512, 128)

    print(
        json.dumps(
            {
                "metric": "inference images/sec/chip @256x256 bf16 (batch 128, serving engine, flat-layout NAT)",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / A100_EST_IMG_S, 3),
                "train_img_s": round(train_best, 1),
                "img_s_384": img_s_384,
                "img_s_512": img_s_512,
            }
        )
    )


if __name__ == "__main__":
    main()
