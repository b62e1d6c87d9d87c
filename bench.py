"""Benchmark: LM-Net TPU inference throughput (images/sec/chip @ 256x256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: deploy-mode (structurally re-parameterized) LM-Net, bf16 compute,
batch-size sweep, steady-state timing after warmup — the serving
configuration the north-star targets (BASELINE.json: ">=5x A100 inference
images/sec/chip on v5e").

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
# NATTEN CUDA, fp16) single-A100 inference estimate at 256x256.
A100_EST_IMG_S = 1500.0


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lmnet_tpu.models import LMNet, structural_reparam

    rng = jax.random.key(0)
    train_model = LMNet(num_classes=2)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda k: train_model.init(k, x0, train=False))(rng)
    deploy_vars = structural_reparam(variables)
    model = LMNet(num_classes=2, deploy=True, dtype=jnp.bfloat16)

    @jax.jit
    def forward(v, x):
        return model.apply(v, x, train=False)

    best = 0.0
    best_bs = 0
    for bs in (32, 64, 128):
        x = jnp.zeros((bs, 256, 256, 3), jnp.bfloat16)
        y = forward(deploy_vars, x)
        y.block_until_ready()  # compile + warmup
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            y = forward(deploy_vars, x)
        y.block_until_ready()
        dt = time.perf_counter() - t0
        ips = bs * iters / dt
        if ips > best:
            best, best_bs = ips, bs
    print(
        json.dumps(
            {
                "metric": f"inference images/sec/chip @256x256 bf16 (batch {best_bs}, deploy-fused)",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / A100_EST_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
