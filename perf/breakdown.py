"""Per-component device-time breakdown of the deploy forward on TPU.

Times each piece of the LM-Net deploy graph in isolation with the same
chained-fori_loop methodology as bench.py (iterations chained inside one
XLA program; one scalar readback), so tunnel RTT doesn't pollute numbers.

Usage: python perf/breakdown.py [--batch 64] [--size 256]
"""

from __future__ import annotations

import argparse
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
    """Time fn(*args) -> array, chained ITERS times on device."""

    def chain(*a):
        def body(i, acc):
            y = fn(*[x + (acc * 1e-30).astype(x.dtype) if i == 0 else x for i, x in enumerate(a)])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    try:
        float(g(*args))  # compile + warm
    except Exception as e:
        print(f"{name:55s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return float("nan")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:55s} {best * 1e3:9.3f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--full-only", action="store_true")
    args = ap.parse_args()
    B, S = args.batch, args.size

    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    print(f"batch={B} size={S} device={jax.devices()[0]}")

    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)
    p, s = deploy_vars["params"], deploy_vars["batch_stats"]

    bf16 = jnp.bfloat16
    x = jnp.ones((B, S, S, 3), bf16)

    # ---- full forwards ------------------------------------------------
    model_px = LMNet(num_classes=2, deploy=True, dtype=bf16, nat_backend="pallas")
    model_xx = LMNet(num_classes=2, deploy=True, dtype=bf16, nat_backend="xla")
    timeit("flax apply deploy (NAT pallas)", lambda x: model_px.apply(deploy_vars, x, train=False), x)
    timeit("flax apply deploy (NAT xla)", lambda x: model_xx.apply(deploy_vars, x, train=False), x)
    timeit(
        "serve deploy_forward (rc pallas, nat pallas)",
        lambda x: deploy_forward(deploy_vars, x, rc_backend="pallas", nat_backend="pallas"), x,
    )
    timeit(
        "serve deploy_forward (rc xla, nat pallas)",
        lambda x: deploy_forward(deploy_vars, x, rc_backend="xla", nat_backend="pallas"), x,
    )
    if args.full_only:
        return

    # ---- per-component ------------------------------------------------
    from lmnet_tpu.ops.pallas.nat_kernel import neighborhood_attention_pallas
    from lmnet_tpu.ops.nat import neighborhood_attention
    from lmnet_tpu.ops.pallas.rc_kernel import fold_rc_weights, fused_reparam_conv
    from lmnet_tpu.ops.resize import adaptive_avg_pool, upsample2x_align_corners
    from lmnet_tpu.serve import engine as se

    f = (12, 24, 48, 96, 192)

    # RC blocks per stage (deploy), xla vs pallas
    stage_specs = [  # (name, H, W, Cin)
        ("conv1_0", S, S, 3),
        ("conv1_1", S, S, f[0]),
        ("conv2_0", S // 2, S // 2, f[1]),
        ("conv3_0", S // 4, S // 4, f[2]),
        ("conv4_0", S // 8, S // 8, f[3]),
        ("dconv4_0", S, S, f[1]),
    ]
    for name, H, W, Cin in stage_specs:
        h = jnp.ones((B, H, W, Cin), bf16)
        blk, bst = p[name], s[name]

        def rc_xla(h, blk=blk, bst=bst):
            e = jax.nn.hard_swish(se._bn(blk["expand_bn"], bst["expand_bn"], se._conv(blk["expand_conv"], h)))
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

        def rc_pl(h, blk=blk, bst=bst):
            return fused_reparam_conv(h, fold_rc_weights(blk, bst))

        timeit(f"RC {name} ({H}x{W}x{Cin}) xla", rc_xla, h)
        timeit(f"RC {name} ({H}x{W}x{Cin}) pallas", rc_pl, h)

    # bare depthwise 5x5 at stage-1 expanded size
    e = jnp.ones((B, S, S, f[1]), bf16)
    kd = p["conv1_0"]["fuse_conv"]["conv"]["kernel"].astype(bf16)

    def dw(e):
        return jax.lax.conv_general_dilated(
            e, kd, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=e.shape[-1],
        )

    timeit(f"bare dw5x5 {S}x{S}x{f[1]} xla", dw, e)

    # NAT at the 4 scales, pallas vs xla (bare op incl qkv-transpose costs)
    for dim, scale in ((f[3], S // 8), (f[2], S // 4), (f[1], S // 2), (f[0], S)):
        q = jnp.ones((B, scale, scale, dim), bf16)
        rpb = jnp.zeros((12, 5, 5), jnp.float32)
        timeit(
            f"NAT {scale}x{scale}x{dim} pallas",
            lambda q, rpb=rpb: neighborhood_attention_pallas(q, q, q, rpb, 3), q,
        )
        timeit(
            f"NAT {scale}x{scale}x{dim} xla",
            lambda q, rpb=rpb: neighborhood_attention(q, q, q, rpb, 3), q,
        )

    # NAT full blocks (embed+LN+qkv+NAT+proj+MLP)
    for name, dim, scale in (("natt1", f[3], S // 8), ("natt2", f[2], S // 4), ("natt3", f[1], S // 2), ("natt4", f[0], S)):
        h = jnp.ones((B, scale, scale, dim), bf16)
        timeit(
            f"NATT block {name} {scale}x{scale}x{dim} (pallas)",
            lambda h, name=name: se._natt(p[name], h, 12, "pallas"), h,
        )

    # GFT bottleneck
    hp = jnp.ones((B, S // 16, S // 16, sum(f)), bf16)
    timeit(f"GFT {S//16}x{S//16}x{sum(f)}", lambda h: se._gft(p["gft"], h, 12), hp)

    # pyramid pool
    xs = [jnp.ones((B, S // (2 ** i), S // (2 ** i), f[i]), bf16) for i in range(4)]
    xl = jnp.ones((B, S // 16, S // 16, f[4]), bf16)
    timeit(
        "pyramid_pool",
        lambda a, b, c, d, e_: jnp.concatenate(
            [adaptive_avg_pool(t, (S // 16, S // 16)) for t in (a, b, c, d)] + [e_], -1
        ),
        *xs, xl,
    )

    # skips
    timeit("m2skip skip1", lambda a, b: se._m2skip(p["skip1"], s["skip1"], a, b, "bottom"), xs[2], xs[3])
    timeit("m3skip skip3", lambda a, b, c: se._m3skip(p["skip3"], s["skip3"], a, b, c), xs[0], xs[1], xs[2])

    # upsample + conv (decoder up4: 128->256)
    h8 = jnp.ones((B, S // 2, S // 2, f[1]), bf16)
    timeit("up4 (bilinear2x + 3x3 conv)", lambda h: se._conv(p["up4"], upsample2x_align_corners(h)), h8)
    timeit("bare upsample2x 128->256 x24", upsample2x_align_corners, h8)

    # downsample
    h1 = jnp.ones((B, S, S, f[0]), bf16)
    timeit("down1 (3x3 s2 conv)", lambda h: se._conv(p["down1"], h, 2), h1)

    # head
    h9 = jnp.ones((B, S, S, f[0]), bf16)
    timeit("output 1x1 head", lambda h: se._conv(p["output_layer"], h), h9)

    # elementwise: gelu at stage-1 expanded size
    timeit(f"bare gelu(tanh) {S}x{S}x{f[1]}", lambda t: jax.nn.gelu(t, approximate=True), e)

    # transpose cost probe (the NAT NHWC->NHCW relayout)
    q = jnp.ones((B, S, S, f[0]), bf16)
    timeit("bare transpose NHWC->NHCW 256^2x12", lambda q: q.transpose(0, 1, 3, 2) * 1.0, q)


if __name__ == "__main__":
    main()
