"""Roofline accounting for the deploy forward at 256^2 B=128 (VERDICT r3 #4).

Partitions the e2e graph into the four ledger buckets — NAT kernels,
RC blocks, NATT interiors, skips/GFT/pyramid/resizes — measures each
component in ISOLATION (chained-fori methodology, same as bench.py), and
computes per component:

  * analytic MXU flops        (2*MACs of every dense conv / matmul)
  * analytic VPU ops          (documented per-element estimates below)
  * analytic HBM traffic      (materialization-aware: every conv/dot
                               boundary writes+reads HBM, elementwise
                               chains fuse; weights ignored — they are
                               <2 MB total and prefetch async)

then prints achieved TFLOP/s / T vop/s / GB/s per bucket vs v5e peaks and
names the binding resource.  Conventions:

  * v5e peaks: MXU 197 TFLOP/s bf16, HBM 819 GB/s (public spec).
    VPU: 8x128 lanes x 4 ALUs x ~1.5 GHz (clock implied by the MXU spec:
    197e12 / (4 MXUs * 128*128 MACs * 2)) = ~6.1 T op/s counting one
    mul-or-add per op; ALU FMA pairing can reach ~12.3 T for pure MAC
    streams, so dw-conv utilization is reported against BOTH.
  * VPU per-element op estimates (+-30%): dw5x5 conv 50 (25 MACs x2),
    hard_swish 4, gelu(tanh) 15, BN/LN affine 2, LayerNorm 10, bilinear
    2x upsample 8/out-elem, adaptive pool 2/in-elem, NAT core per px:
    taps*(4*C) MAC ops + heads*taps*9 softmax/rpb ops (exp2 counted 7).
  * isolated-component time omits async weight prefetch overlap and the
    XLA scheduler's inter-op gaps, so bucket sums land a few ms under the
    e2e step — the residue is accounted in the printed footer.

Usage: python perf/roofline.py [--batch 128] [--size 256]
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
MXU_PEAK = 197e12          # bf16 FLOP/s
HBM_PEAK = 819e9           # bytes/s
VPU_PEAK = 6.1e12          # simple vector ops/s (see header)
VPU_PEAK_FMA = 12.3e12     # if every op pairs into an FMA

_RTT = None


def host_rtt():
    """One dispatch+readback of a trivial program — the tunnel RTT that
    every timed call pays ONCE regardless of ITERS (bench.py subtracts the
    same constant; without it every component reads ~RTT/ITERS high, which
    at 25 ms RTT is a +2.5 ms floor that doubled the round-4 bucket sums)."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.zeros(())))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(jnp.zeros(())))
            best = min(best, time.perf_counter() - t0)
        _RTT = best
        print(f"host<->device RTT: {best*1e3:.2f} ms (subtracted per call)")
    return _RTT


def timeit(fn, *args):
    rtt = host_rtt()
    def chain(*a):
        def body(i, acc):
            y = fn(*[
                x + (acc * 1e-30).astype(x.dtype) if j == 0 else x
                for j, x in enumerate(a)
            ])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    float(g(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
    return best


class Item:
    def __init__(self, name, bucket, ms, flops, vops, bts, count=1):
        self.name, self.bucket, self.count = name, bucket, count
        self.ms, self.flops, self.vops, self.bytes = (
            ms * count, flops * count, vops * count, bts * count
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    B, S = args.batch, args.size
    bf16 = jnp.bfloat16
    E = 2  # bytes/elem

    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.ops.nat import neighborhood_attention  # noqa: F401
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat
    from lmnet_tpu.ops.resize import adaptive_avg_pool, upsample2x_align_corners
    from lmnet_tpu.serve import engine as se

    print(f"batch={B} size={S} device={jax.devices()[0]}", flush=True)
    train_model = LMNet(num_classes=2)
    variables = jax.jit(
        lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    dv = structural_reparam(variables)
    p, s = dv["params"], dv["batch_stats"]
    f = (12, 24, 48, 96, 192)
    items: list[Item] = []

    # ---- RC blocks (deploy: expand 1x1 -> dw5x5 -> SE -> pw 1x1 + shortcut)
    rc_specs = [  # (param name to borrow, H, Cin, ec, Cout, instance count)
        ("conv1_0", S, 3, 24, 12, 1),
        ("conv1_1", S, 12, 24, 12, 3),        # conv1_1, dconv4_0/1
        ("conv2_0", S // 2, 24, 48, 24, 4),   # conv2_*, dconv3_*
        ("conv3_0", S // 4, 48, 96, 48, 4),   # conv3_*, dconv2_*
        ("conv4_0", S // 8, 96, 192, 96, 4),  # conv4_*, dconv1_*
    ]
    for name, H, Cin, ec, Cout, n in rc_specs:
        h = jnp.ones((B, H, H, Cin), bf16)
        blk, bst = p[name], s[name]

        def rc(h, blk=blk, bst=bst):
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
            return se._conv(blk["pointwise_conv"], t * sc) + se._conv(blk["shortcut"], h)

        px = B * H * H
        flops = 2 * px * (Cin * ec + ec * Cout + Cin * Cout)
        vops = px * ec * (50 + 4 + 15 + 2 + 1)  # dw + hswish + gelu + bn + se-mul
        # traffic: x read twice (expand + shortcut), e w+r, t w+2r (SE pool
        # + gelu chain), t2 w+r, branch outs w+r+w
        bts = E * px * (2 * Cin + 2 * ec + 3 * ec + 2 * ec + 3 * Cout)
        ms = timeit(rc, h)
        items.append(Item(f"RC {H}x{H} ec={ec} x{n}", "RC blocks", ms, flops, vops, bts, n))
        print(f"  RC {H:3d}^2 ec={ec:3d}: {ms*1e3:7.3f} ms x{n}", flush=True)

    # ---- NAT cores (flat kernel) --------------------------------------
    heads, taps = 12, 9
    for dim, scale, pname in ((f[3], S // 8, "natt1"), (f[2], S // 4, "natt2"),
                              (f[1], S // 2, "natt3"), (f[0], S, "natt4")):
        q = jnp.ones((B, scale, scale * dim), bf16)
        rpb = p[pname]["attn"]["rpb"]

        def core(q, rpb=rpb, dim=dim, scale=scale):
            return nat_flat(q, q, q, rpb, heads, dim, scale)

        px = B * scale * scale
        flops = 0  # no MXU work in the flat kernel
        vops = px * (taps * 4 * dim + heads * taps * 9)
        bts = E * px * dim * 4  # q,k,v in + out  (halo re-reads ~+25% ignored)
        ms = timeit(core, q)
        items.append(Item(f"NAT core {scale}x{scale}x{dim}", "NAT kernels", ms, flops, vops, bts))
        print(f"  NAT {scale:3d}^2 C={dim:3d}: {ms*1e3:7.3f} ms", flush=True)

    # ---- NATT interiors (embed+LN+qkv / proj+LN+MLP, NAT core bypassed) -
    for dim, scale, pname in ((f[3], S // 8, "natt1"), (f[2], S // 4, "natt2"),
                              (f[1], S // 2, "natt3"), (f[0], S, "natt4")):
        h = jnp.ones((B, scale, scale, dim), bf16)
        blk = p[pname]

        def interior(h, blk=blk):
            emb = se._conv(blk["embed"]["proj"], h)
            C = emb.shape[-1]
            ln1 = se._ln(blk["norm1"], emb)
            wq = blk["attn"]["qkv"]["dense"]["kernel"].astype(ln1.dtype)
            bq = blk["attn"]["qkv"]["dense"]["bias"].astype(ln1.dtype)
            q = ln1 @ wq[:, :C] + bq[:C]
            k = ln1 @ wq[:, C:2 * C] + bq[C:2 * C]
            v = ln1 @ wq[:, 2 * C:] + bq[2 * C:]
            nat = q + k + v  # stand-in for the core (measured separately)
            att = se._dense(blk["attn"]["proj"], nat) + emb
            return se._mlp(blk["mlp"], se._ln(blk["norm2"], att)) + att

        px, C = B * scale * scale, dim
        flops = 2 * px * C * C * (9 + 3 + 1 + 2 + 2)  # embed9,qkv3,proj,fc1(2C),fc2
        vops = px * C * (10 + 10 + 15 * 2 + 4)  # 2 LN, gelu on 2C, residuals
        # x r | emb w+2r | ln1 w+3r | q,k,v 3(w+r) | proj w+r | att w+2r |
        # ln2 w+r | fc1out 2C w+r | out w
        bts = E * px * C * (1 + 3 + 4 + 6 + 2 + 3 + 2 + 4 + 1)
        ms = timeit(interior, h)
        items.append(Item(f"NATT interior {scale}x{scale}x{dim}", "NATT interiors", ms, flops, vops, bts))
        print(f"  NATT int {scale:3d}^2 C={dim:3d}: {ms*1e3:7.3f} ms", flush=True)

    # ---- skips / GFT / pyramid / resizes / downs / head -----------------
    def add(name, fn, flops, vops, bts, *xs):
        ms = timeit(fn, *xs)
        items.append(Item(name, "skips/GFT/resizes", ms, flops, vops, bts))
        print(f"  {name}: {ms*1e3:7.3f} ms", flush=True)

    xs_enc = [jnp.ones((B, S // (2 ** i), S // (2 ** i), f[i]), bf16) for i in range(4)]
    px = lambda H: B * H * H  # noqa: E731

    # skip1: M2 bottom (64^2x48, 32^2x96) -> 96@32^2
    H = S // 8
    add("skip1 M2", lambda a, b: se._m2skip(p["skip1"], s["skip1"], a, b, "bottom"),
        2 * px(H) * (9 * 48 * 96 + 9 * 96 * 96 + 2 * 9 * 96 * 96),
        px(H) * 96 * (2 + 15),
        E * (px(S // 4) * 48 + px(H) * 96 * 7),
        xs_enc[2], xs_enc[3])
    # skip2: M3 (128^2x24, 64^2x48, 32^2x96) -> 48@64^2
    H = S // 4
    add("skip2 M3", lambda a, b, c: se._m3skip(p["skip2"], s["skip2"], a, b, c),
        2 * px(H) * (9 * 24 * 48 + 9 * 48 * 48 + 9 * 96 * 48 + 3 * 9 * 48 * 48),
        px(H) * 48 * (2 + 15) + px(H) * 96 * 8,
        E * (px(S // 2) * 24 + px(H) * (48 + 96 + 48 * 9)),
        xs_enc[1], xs_enc[2], xs_enc[3])
    # skip3: M3 (256^2x12, 128^2x24, 64^2x48) -> 24@128^2
    H = S // 2
    add("skip3 M3", lambda a, b, c: se._m3skip(p["skip3"], s["skip3"], a, b, c),
        2 * px(H) * (9 * 12 * 24 + 9 * 24 * 24 + 9 * 48 * 24 + 3 * 9 * 24 * 24),
        px(H) * 24 * (2 + 15) + px(H) * 48 * 8,
        E * (px(S) * 12 + px(H) * (24 + 48 + 24 * 9)),
        xs_enc[0], xs_enc[1], xs_enc[2])
    # skip4: M2 top (256^2x12, 128^2x24) -> 12@256^2
    H = S
    add("skip4 M2", lambda a, b: se._m2skip(p["skip4"], s["skip4"], a, b, "top"),
        2 * px(H) * (9 * 12 * 12 + 9 * 24 * 12 + 2 * 9 * 12 * 12),
        px(H) * 12 * (2 + 15) + px(H) * 24 * 8,
        E * (px(S // 2) * 24 + px(H) * (12 + 24 + 12 * 7)),
        xs_enc[0], xs_enc[1])

    # GFT @16^2, C=372
    Cg, N = sum(f), (S // 16) ** 2
    hp = jnp.ones((B, S // 16, S // 16, Cg), bf16)
    add("GFT", lambda h: se._gft(p["gft"], h, 12),
        2 * B * N * Cg * Cg * (9 + 3 + 1 + 2 + 2) + 2 * B * N * N * Cg * 2
        + 2 * B * N * Cg * f[4],
        B * N * (Cg * 60 + N * 12 * 8),
        E * B * N * Cg * 26,
        hp)

    # pyramid pool (4 adaptive pools + concat)
    xl = jnp.ones((B, S // 16, S // 16, f[4]), bf16)
    pool_in = sum(px(S // 2 ** i) * f[i] for i in range(4))
    add("pyramid_pool",
        lambda a, b, c, d, e_: jnp.concatenate(
            [adaptive_avg_pool(t, (S // 16, S // 16)) for t in (a, b, c, d)] + [e_], -1),
        0, 2 * pool_in, E * (pool_in + px(S // 16) * Cg),
        *xs_enc, xl)

    # decoder ups: bilinear2x + 3x3 conv
    for name, Hin, Cin, Cout in (("up1", S // 16, 192, 96), ("up2", S // 8, 96, 48),
                                 ("up3", S // 4, 48, 24), ("up4", S // 2, 24, 12)):
        h = jnp.ones((B, Hin, Hin, Cin), bf16)
        Ho = Hin * 2
        add(f"{name} (2x + 3x3)",
            lambda h, name=name: se._conv(p[name], upsample2x_align_corners(h)),
            2 * px(Ho) * 9 * Cin * Cout,
            px(Ho) * Cin * 8,
            E * (px(Hin) * Cin + 2 * px(Ho) * Cin + px(Ho) * Cout),
            h)

    # encoder downs: 3x3 s2 conv
    for name, Hin, Cin, Cout in (("down1", S, 12, 24), ("down2", S // 2, 24, 48),
                                 ("down3", S // 4, 48, 96), ("down4", S // 8, 96, 192)):
        h = jnp.ones((B, Hin, Hin, Cin), bf16)
        add(f"{name} (3x3 s2)", lambda h, name=name: se._conv(p[name], h, 2),
            2 * px(Hin // 2) * 9 * Cin * Cout, 0,
            E * (px(Hin) * Cin + px(Hin // 2) * Cout), h)

    # 1x1 head
    h9 = jnp.ones((B, S, S, f[0]), bf16)
    add("head 1x1", lambda h: se._conv(p["output_layer"], h),
        2 * px(S) * 12 * 2, 0, E * px(S) * 12 + 4 * px(S) * 2, h9)

    # ---- e2e reference point -------------------------------------------
    model = LMNet(num_classes=2, deploy=True, dtype=bf16)
    x = jnp.ones((B, S, S, 3), bf16)
    e2e = timeit(lambda x: model.apply(dv, x, train=False), x)
    print(f"\ne2e deploy forward: {e2e*1e3:.2f} ms ({B/e2e:.0f} img/s)", flush=True)

    # ---- bucket table ----------------------------------------------------
    buckets = {}
    for it in items:
        b = buckets.setdefault(it.bucket, [0.0, 0.0, 0.0, 0.0])
        b[0] += it.ms; b[1] += it.flops; b[2] += it.vops; b[3] += it.bytes
    print(f"\n{'bucket':22s} {'ms':>8s} {'TF/s':>6s} {'%MXU':>5s} "
          f"{'Tvop/s':>7s} {'%VPU':>9s} {'GB/s':>6s} {'%HBM':>5s}  binding")
    tot_ms = 0.0
    for name, (ms, fl, vo, by) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        tot_ms += ms
        tf = fl / ms / 1e12 if ms else 0
        tv = vo / ms / 1e12 if ms else 0
        gb = by / ms / 1e9 if ms else 0
        pm = 100 * tf * 1e12 / MXU_PEAK
        pv = 100 * tv * 1e12 / VPU_PEAK
        pvf = 100 * tv * 1e12 / VPU_PEAK_FMA
        ph = 100 * gb * 1e9 / HBM_PEAK
        binding = max((pm, "MXU"), (pv, "VPU"), (ph, "HBM"))[1]
        print(f"{name:22s} {ms*1e3:8.2f} {tf:6.1f} {pm:5.1f} "
              f"{tv:7.2f} {pv:5.1f}/{pvf:3.0f} {gb:6.0f} {ph:5.1f}  {binding}")
    print(f"{'sum of buckets':22s} {tot_ms*1e3:8.2f}   (e2e {e2e*1e3:.2f} ms; "
          f"residue = scheduler gaps + fusion boundaries not isolated here)")


if __name__ == "__main__":
    main()
