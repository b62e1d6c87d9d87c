"""Roofline accounting for the TRAIN step at 256^2 B=128 bf16 (VERDICT r4
ask #2 — the serving path got this treatment in round 4, perf/roofline.py;
the 643 ms train step never did).

Buckets (reference hot path: /root/reference/core/modules.py:586-600 — the
4-branch train graph being paid for):

  * RC blocks         — train-mode fwd+bwd: expand+BN+hswish -> 4 dw
                        branches each with its own BN stat pass -> GELU ->
                        SE -> pointwise + shortcut
  * NAT kernels       — flat Pallas fwd + fused bwd
  * NATT interiors    — NeighborhoodTransformer fwd+bwd MINUS the NAT core
                        (differencing, both measured in isolation)
  * skips/GFT/resizes — M2/M3 skips, GFT, pyramid pool, up/down convs, head
  * loss/metrics      — CE+Dice value_and_grad + argmax + confusion update
  * optimizer/BN      — AdamW update + BN running-stat merge (param-sized)
  * remat tax         — per-RC-block fwd+bwd time under jax.checkpoint vs
                        plain (the e2e A/B in BASELINE.md showed remat WINS
                        +5.4% by avoiding compressed-remat spills; the
                        isolated delta here is the raw recompute cost that
                        buys that win)

Methodology identical to perf/roofline.py: chained-fori isolation, tunnel
RTT subtracted, analytic MXU flops / VPU ops / materialization-aware HBM
bytes per component.  Train-specific conventions (documented +-40%):

  * fwd+bwd MXU flops  = 3x fwd conv flops (dgrad + wgrad each ~1x)
  * fwd+bwd VPU ops    = 3x fwd elementwise (branch dgrad ~1x taps, wgrad
                         reduction ~1x taps)
  * fwd+bwd HBM bytes  = 3x fwd (residual reads ~= fwd writes; grad writes
                         ~= fwd reads)
  * train-mode RC fwd VPU/elem on ec channels: 4 branches = 80 (40 MACs x2)
    + 4 BN stat passes ~16 + 4 BN normalizes ~8 + branch sum 3 + hswish 4 +
    gelu 15 + SE mul 1 = ~127
  * BN stat reductions also appear in skips (fuse_bn) ~ +6/elem

Usage: python perf/roofline_train.py [--batch 128] [--size 256]
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
MXU_PEAK = 197e12
HBM_PEAK = 819e9
VPU_PEAK = 6.1e12
VPU_PEAK_FMA = 12.3e12
BWD = 3.0  # fwd+bwd = BWD x fwd analytics (see header)

_RTT = None


def host_rtt():
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


def timeit(fn, x, *rest):
    """fn(x, *rest) -> scalar; chained ITERS times with a data dependency
    injected into x (the first arg, always an array here)."""
    rtt = host_rtt()

    def chain(x, *rest):
        def body(i, acc):
            return acc + fn(x + (acc * 1e-30).astype(x.dtype), *rest)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    float(g(x, *rest))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x, *rest))
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
    E = 2

    from lmnet_tpu.models.blocks import (
        GFT,
        M2Skip,
        M3Skip,
        NeighborhoodTransformer,
        ReparamConv,
        TorchConv,
    )
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat
    from lmnet_tpu.ops.resize import adaptive_avg_pool, upsample2x_align_corners

    print(f"batch={B} size={S} device={jax.devices()[0]}", flush=True)
    f = (12, 24, 48, 96, 192)
    items: list[Item] = []
    key = jax.random.key(0)

    def fwd_bwd_time(module, xs, train_kw, label):
        """(fwd_ms, fwdbwd_ms) of a flax module applied train-mode with
        grads w.r.t. params AND inputs."""
        init_kw = dict(train_kw)
        if "deterministic" in init_kw:
            init_kw["deterministic"] = True  # no dropout rng needed at init
        variables = module.init(key, *xs, **init_kw)
        has_bn = "batch_stats" in variables

        def fwd(x0, *rest):
            v = variables
            if has_bn:
                out, _ = module.apply(
                    v, x0, *rest, **train_kw, mutable=["batch_stats"],
                    rngs={"dropout": key} if "deterministic" in train_kw else {},
                )
            else:
                out = module.apply(
                    v, x0, *rest, **train_kw,
                    rngs={"dropout": key} if "deterministic" in train_kw else {},
                )
            return jnp.sum(out.astype(jnp.float32))

        def fb(x0, *rest):
            def loss(p, x0):
                v = {"params": p, **{k: variables[k] for k in variables if k != "params"}}
                if has_bn:
                    out, _ = module.apply(
                        v, x0, *rest, **train_kw, mutable=["batch_stats"],
                        rngs={"dropout": key} if "deterministic" in train_kw else {},
                    )
                else:
                    out = module.apply(
                        v, x0, *rest, **train_kw,
                        rngs={"dropout": key} if "deterministic" in train_kw else {},
                    )
                return jnp.sum(out.astype(jnp.float32))

            l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                variables["params"], x0
            )
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gp)) \
                + jnp.sum(gx).astype(jnp.float32)

        t_f = timeit(fwd, *xs)
        t_fb = timeit(fb, *xs)
        print(f"  {label}: fwd {t_f*1e3:7.3f}  fwd+bwd {t_fb*1e3:7.3f} ms", flush=True)
        return t_f, t_fb

    # ---- RC blocks, train mode (+ remat tax) ----------------------------
    rc_specs = [  # (H, Cin, ec, Cout, instance count)
        (S, 3, 24, 12, 1),
        (S, 12, 24, 12, 3),
        (S // 2, 24, 48, 24, 4),
        (S // 4, 48, 96, 48, 4),
        (S // 8, 96, 192, 96, 4),
    ]
    remat_tax_ms = 0.0
    for H, Cin, ec, Cout, n in rc_specs:
        x = jnp.ones((B, H, H, Cin), bf16)
        mod = ReparamConv(ec, Cout, dtype=bf16)
        _, t_fb = fwd_bwd_time(mod, (x,), {"train": True}, f"RC {H}^2 ec={ec}")

        # remat variant: same block under jax.checkpoint (what rc_remat=True
        # wraps) — isolated delta = raw recompute cost
        variables = mod.init(key, x, train=True)

        def fb_remat(x0, variables=variables, mod=mod):
            @jax.checkpoint
            def blk(p, x0):
                out, _ = mod.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x0, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(out.astype(jnp.float32))

            l, (gp, gx) = jax.value_and_grad(blk, argnums=(0, 1))(
                variables["params"], x0
            )
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gp)) \
                + jnp.sum(gx).astype(jnp.float32)

        t_fb_r = timeit(fb_remat, x)
        print(f"    remat fwd+bwd {t_fb_r*1e3:7.3f} ms (tax {1e3*(t_fb_r-t_fb):+.3f})",
              flush=True)
        remat_tax_ms += (t_fb_r - t_fb) * n * 1e3

        px = B * H * H
        fl = BWD * 2 * px * (Cin * ec + ec * Cout + Cin * Cout)
        vo = BWD * px * ec * 127
        by = BWD * E * px * (2 * Cin + 2 * ec + 3 * ec + 2 * ec + 3 * Cout)
        items.append(Item(f"RC {H}x{H} ec={ec} x{n}", "RC blocks",
                          t_fb_r, fl, vo, by, n))  # remat'ed time = the live path

    # ---- NAT cores fwd+bwd (flat kernel + fused bwd) --------------------
    heads, taps = 12, 9
    nat_fb = {}
    for dim, scale in ((f[3], S // 8), (f[2], S // 4), (f[1], S // 2), (f[0], S)):
        q = jnp.ones((B, scale, scale * dim), bf16)
        rpb = jnp.zeros((heads, 5, 5), jnp.float32)

        def core_fb(q, rpb=rpb, dim=dim, scale=scale):
            def loss(q):
                return jnp.sum(
                    nat_flat(q, q, q, rpb, heads, dim, scale).astype(jnp.float32)
                )

            l, g = jax.value_and_grad(loss)(q)
            return l + jnp.sum(g).astype(jnp.float32)

        ms = timeit(core_fb, q)
        nat_fb[(dim, scale)] = ms
        px = B * scale * scale
        vo = BWD * px * (taps * 4 * dim + heads * taps * 9)
        by = BWD * E * px * dim * 4
        items.append(Item(f"NAT core {scale}^2 C={dim}", "NAT kernels", ms, 0, vo, by))
        print(f"  NAT core {scale:3d}^2 C={dim:3d}: fwd+bwd {ms*1e3:7.3f} ms", flush=True)

    # ---- NATT blocks fwd+bwd; interior = block - core -------------------
    for dim, scale in ((f[3], S // 8), (f[2], S // 4), (f[1], S // 2), (f[0], S)):
        x = jnp.ones((B, scale, scale, dim), bf16)
        mod = NeighborhoodTransformer(dim, num_heads=heads, dtype=bf16)
        _, t_fb = fwd_bwd_time(
            mod, (x,), {"deterministic": False}, f"NATT block {scale}^2 C={dim}"
        )
        interior = max(t_fb - nat_fb[(dim, scale)], 1e-6)
        px, C = B * scale * scale, dim
        fl = BWD * 2 * px * C * C * (9 + 3 + 1 + 2 + 2)
        vo = BWD * px * C * (10 + 10 + 15 * 2 + 4)
        by = BWD * E * px * C * 26
        items.append(Item(f"NATT interior {scale}^2 C={dim}", "NATT interiors",
                          interior, fl, vo, by))

    # ---- skips / GFT / pyramid / resizes / downs / head -----------------
    px = lambda H: B * H * H  # noqa: E731
    xs_enc = [jnp.ones((B, S // 2 ** i, S // 2 ** i, f[i]), bf16) for i in range(4)]

    def add_fb(name, module, xs, flops, vops, bts, train_kw=None):
        if train_kw is None:
            train_kw = {"train": True}
        _, t_fb = fwd_bwd_time(module, xs, train_kw, name)
        items.append(Item(name, "skips/GFT/resizes", t_fb,
                          BWD * flops, BWD * vops, BWD * bts))

    H = S // 8
    add_fb("skip1 M2", M2Skip((48, 96), "bottom", dtype=bf16),
           (xs_enc[2], xs_enc[3]),
           2 * px(H) * (9 * 48 * 96 + 9 * 96 * 96 + 2 * 9 * 96 * 96),
           px(H) * 96 * (8 + 15),
           E * (px(S // 4) * 48 + px(H) * 96 * 7))
    H = S // 4
    add_fb("skip2 M3", M3Skip((24, 48, 96), dtype=bf16),
           (xs_enc[1], xs_enc[2], xs_enc[3]),
           2 * px(H) * (9 * 24 * 48 + 9 * 48 * 48 + 9 * 96 * 48 + 3 * 9 * 48 * 48),
           px(H) * 48 * (8 + 15) + px(H) * 96 * 8,
           E * (px(S // 2) * 24 + px(H) * (48 + 96 + 48 * 9)))
    H = S // 2
    add_fb("skip3 M3", M3Skip((12, 24, 48), dtype=bf16),
           (xs_enc[0], xs_enc[1], xs_enc[2]),
           2 * px(H) * (9 * 12 * 24 + 9 * 24 * 24 + 9 * 48 * 24 + 3 * 9 * 24 * 24),
           px(H) * 24 * (8 + 15) + px(H) * 48 * 8,
           E * (px(S) * 12 + px(H) * (24 + 48 + 24 * 9)))
    H = S
    add_fb("skip4 M2", M2Skip((12, 24), "top", dtype=bf16),
           (xs_enc[0], xs_enc[1]),
           2 * px(H) * (9 * 12 * 12 + 9 * 24 * 12 + 2 * 9 * 12 * 12),
           px(H) * 12 * (8 + 15) + px(H) * 24 * 8,
           E * (px(S // 2) * 24 + px(H) * (12 + 24 + 12 * 7)))

    Cg, N = sum(f), (S // 16) ** 2
    hp = jnp.ones((B, S // 16, S // 16, Cg), bf16)
    add_fb("GFT", GFT(Cg, f[4], num_heads=12, dtype=bf16), (hp,),
           2 * B * N * Cg * Cg * (9 + 3 + 1 + 2 + 2) + 2 * B * N * N * Cg * 2
           + 2 * B * N * Cg * f[4],
           B * N * (Cg * 60 + N * 12 * 8),
           E * B * N * Cg * 26,
           train_kw={"deterministic": False})

    # pyramid pool fwd+bwd (pure fn)
    xl = jnp.ones((B, S // 16, S // 16, f[4]), bf16)

    def pool_fb(a, b, c, d, e_):
        def loss(a, b, c, d, e_):
            return jnp.sum(jnp.concatenate(
                [adaptive_avg_pool(t, (S // 16, S // 16)) for t in (a, b, c, d)]
                + [e_], -1).astype(jnp.float32))

        l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(a, b, c, d, e_)
        return l + sum(jnp.sum(g).astype(jnp.float32) for g in gs)

    pool_in = sum(px(S // 2 ** i) * f[i] for i in range(4))
    ms = timeit(pool_fb, *xs_enc, xl)
    items.append(Item("pyramid_pool", "skips/GFT/resizes", ms,
                      0, BWD * 2 * pool_in, BWD * E * (pool_in + px(S // 16) * Cg)))
    print(f"  pyramid_pool: fwd+bwd {ms*1e3:7.3f} ms", flush=True)

    # decoder ups (2x + 3x3 conv) and encoder downs (3x3 s2) and head
    import flax.linen as nn

    class UpConv(nn.Module):
        cout: int

        @nn.compact
        def __call__(self, x):
            return TorchConv(self.cout, (3, 3), dtype=bf16)(
                upsample2x_align_corners(x)
            )

    for name, Hin, Cin, Cout in (("up1", S // 16, 192, 96), ("up2", S // 8, 96, 48),
                                 ("up3", S // 4, 48, 24), ("up4", S // 2, 24, 12)):
        h = jnp.ones((B, Hin, Hin, Cin), bf16)
        Ho = Hin * 2
        add_fb(f"{name} (2x + 3x3)", UpConv(cout=Cout), (h,),
               2 * px(Ho) * 9 * Cin * Cout, px(Ho) * Cin * 8,
               E * (px(Hin) * Cin + 2 * px(Ho) * Cin + px(Ho) * Cout),
               train_kw={})

    for name, Hin, Cin, Cout in (("down1", S, 12, 24), ("down2", S // 2, 24, 48),
                                 ("down3", S // 4, 48, 96), ("down4", S // 8, 96, 192)):
        h = jnp.ones((B, Hin, Hin, Cin), bf16)
        add_fb(f"{name} (3x3 s2)", TorchConv(Cout, (3, 3), strides=(2, 2), dtype=bf16),
               (h,), 2 * px(Hin // 2) * 9 * Cin * Cout, 0,
               E * (px(Hin) * Cin + px(Hin // 2) * Cout), train_kw={})

    h9 = jnp.ones((B, S, S, f[0]), bf16)
    add_fb("head 1x1", TorchConv(2, (1, 1), dtype=bf16), (h9,),
           2 * px(S) * 12 * 2, 0, E * px(S) * 12 + 4 * px(S) * 2, train_kw={})

    # ---- loss + metrics --------------------------------------------------
    from lmnet_tpu.losses import segmentation_loss
    from lmnet_tpu.metrics.confusion import confusion_matrix

    logits = jnp.ones((B, S, S, 2), jnp.float32)
    labels = jnp.zeros((B, S, S), jnp.int32)

    def loss_fb(logits, labels):
        def loss(lg):
            return segmentation_loss(lg, labels)

        l, g = jax.value_and_grad(loss)(logits)
        cm = confusion_matrix(jnp.argmax(logits, -1), labels, 2)
        return l + jnp.sum(g) + jnp.sum(cm).astype(jnp.float32)

    ms = timeit(loss_fb, logits, labels)
    pxs = B * S * S
    items.append(Item("loss+metrics", "loss/metrics", ms,
                      0, pxs * 2 * 40, 4 * pxs * 2 * 4))
    print(f"  loss+metrics: {ms*1e3:7.3f} ms", flush=True)

    # ---- optimizer + BN update ------------------------------------------
    from lmnet_tpu.train.engine import make_optimizer

    model = LMNet(num_classes=2, dtype=bf16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(key)
    params = variables["params"]
    nparams = sum(int(x.size) for x in jax.tree.leaves(params))
    tx = make_optimizer(base_lr=1e-3, weight_decay=1e-4, epochs=200,
                        steps_per_epoch=100)
    opt_state = tx.init(params)
    import optax

    def opt_step(x, params, opt_state):
        grads = jax.tree.map(lambda p: p * x[0], params)
        updates, _ = tx.update(grads, opt_state, params)
        new_p = optax.apply_updates(params, updates)
        return sum(jnp.sum(q).astype(jnp.float32) for q in jax.tree.leaves(new_p))

    ms = timeit(opt_step, jnp.ones((1,), jnp.float32), params, opt_state)
    items.append(Item("AdamW update", "optimizer/BN", ms,
                      0, nparams * 12, nparams * 4 * 7))  # p,g,m,v r/w f32
    print(f"  AdamW update ({nparams/1e6:.2f}M params): {ms*1e3:7.3f} ms", flush=True)

    # ---- e2e train step reference point ---------------------------------
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.train.engine import create_train_state, train_step

    state = create_train_state(model, key, (1, 64, 64, 3), epochs=200,
                               steps_per_epoch=100)
    xt = jnp.ones((B, S, S, 3), jnp.float32)
    yt = jnp.zeros((B, S, S), jnp.int32)
    cm0 = ConfusionAccumulator.init(2)

    def train_chain(s, x):
        def body(i, carry):
            s, acc = carry
            s, loss, _ = train_step.__wrapped__(s, x, yt, key, cm0)
            return s, acc + loss

        _, acc = jax.lax.fori_loop(0, ITERS, body, (s, jnp.zeros(())))
        return acc

    gt = jax.jit(train_chain)
    float(gt(state, xt))
    rtt = host_rtt()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(gt(state, xt))
        best = min(best, (time.perf_counter() - t0 - rtt) / ITERS)
    e2e = best
    print(f"\ne2e train step: {e2e*1e3:.2f} ms ({B/e2e:.0f} img/s)", flush=True)

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
    print(f"\nisolated remat recompute tax (sum over 16 RC blocks): "
          f"{remat_tax_ms:+.2f} ms — the price paid to avoid XLA's "
          f"compressed-remat spill copies (e2e remat still WINS +5.4%, "
          f"perf/remat_ab.py)")


if __name__ == "__main__":
    main()
