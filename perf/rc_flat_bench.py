"""Microbenchmark: flat-layout fused RC block vs the XLA deploy path.

Run on TPU: PYTHONPATH=. python perf/rc_flat_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10


def timeit(name, fn, *args):
    def chain(*a):
        def body(i, acc):
            y = fn(a[0] + (acc * 1e-30).astype(a[0].dtype), *a[1:])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    try:
        float(g(*args))
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:150]}")
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:52s} {best * 1e3:9.3f} ms")


def main():
    import numpy as np

    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.ops.pallas.rc_flat import (
        dw_gelu_flat, fold_rc_flat_weights, fused_rc_block, _flat_weights,
    )
    from lmnet_tpu.serve import engine as se

    B = 64
    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    dv = structural_reparam(variables)
    p, s = dv["params"], dv["batch_stats"]

    # correctness on TPU at one real config
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 48) * 0.5, jnp.float32)
    fw = fold_rc_flat_weights(p["conv3_0"], s["conv3_0"], 64)
    ours = np.asarray(fused_rc_block(x, fw))
    blk, bst = p["conv3_0"], s["conv3_0"]

    def rc_xla(h, blk=blk, bst=bst):
        e = jax.nn.hard_swish(
            se._bn(blk["expand_bn"], bst["expand_bn"], se._conv(blk["expand_conv"], h))
        )
        kd = blk["fuse_conv"]["conv"]["kernel"]
        t = jax.lax.conv_general_dilated(
            e, kd.astype(e.dtype), (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=e.shape[-1],
        ) + blk["fuse_conv"]["conv"]["bias"].astype(e.dtype)
        t = jax.nn.gelu(t, approximate=True)
        sev = blk["se"]
        m = jnp.mean(t, axis=(1, 2), keepdims=True)
        m = jax.nn.relu(m @ sev["fc1"]["kernel"][0, 0] + sev["fc1"]["bias"])
        sc = jax.nn.hard_sigmoid(m @ sev["fc2"]["kernel"][0, 0] + sev["fc2"]["bias"])
        t = t * sc
        return se._conv(blk["pointwise_conv"], t) + se._conv(blk["shortcut"], h)

    ref = np.asarray(rc_xla(x))
    diff = np.abs(ours - ref).max()
    print(f"TPU correctness conv3_0 max diff: {diff:.2e}")

    # stage-by-stage timing, bf16
    specs = [
        ("conv1_0", 256, 3), ("conv1_1", 256, 12),
        ("conv2_0", 128, 24), ("conv3_0", 64, 48), ("conv4_0", 32, 96),
        ("dconv4_0", 256, 12),
    ]
    for name, S, Cin in specs:
        h = jnp.ones((B, S, S, Cin), jnp.bfloat16)
        fw = fold_rc_flat_weights(p[name], s[name], S)
        blk, bst = p[name], s[name]
        timeit(f"RC {name} {S}^2x{Cin} FLAT-pallas", lambda h, fw=fw: fused_rc_block(h, fw), h)
        timeit(f"RC {name} {S}^2x{Cin} xla", lambda h, b=blk, t=bst: rc_xla(h, b, t), h)

    # bare fused dw+gelu vs bare XLA dw
    for S, C in ((256, 24), (128, 48), (64, 96), (32, 192)):
        e = jnp.ones((B, S, S, C), jnp.bfloat16)
        kd = jnp.asarray(np.random.randn(5, 5, 1, C) * 0.1, jnp.float32)
        wf = _flat_weights(kd, S)
        bf = jnp.zeros((S * C,), jnp.float32)
        ef = e.reshape(B, S, S * C)
        timeit(
            f"dw5x5+gelu+sums {S}^2x{C} FLAT",
            lambda ef, wf=wf, bf=bf, C=C: dw_gelu_flat(ef, wf, bf, C)[0], ef,
        )

        def dwx(e, kd=kd):
            t = jax.lax.conv_general_dilated(
                e, kd.astype(e.dtype), (1, 1), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=e.shape[-1],
            )
            return jax.nn.gelu(t, approximate=True)

        timeit(f"dw5x5+gelu {S}^2x{C} xla", dwx, e)


if __name__ == "__main__":
    main()
