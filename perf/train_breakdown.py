"""Per-component device-time breakdown of the TRAIN step on TPU.

Same chained-fori_loop methodology as perf/breakdown.py (iterations chained
inside one XLA program, single scalar readback — tunnel RTT ~25 ms would
otherwise dominate).

Pieces timed:
  * full train_step (fwd + CE/Dice + bwd + AdamW + BN + confusion)
  * train-mode forward only
  * value_and_grad of forward+loss (no optimizer/metrics)
  * NAT fwd/bwd in isolation at each of the 4 stage shapes
  * one train-mode ReparamConv block fwd and fwd+bwd

Usage: python perf/train_breakdown.py [--batch 32] [--size 256] [--bf16]
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

ITERS = 8


def timeit(name, fn, *args):
    def chain(*a):
        def body(i, acc):
            y = fn(*[x + (acc * 1e-30).astype(x.dtype) if i == 0 else x
                     for i, x in enumerate(a)])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    try:
        float(g(*args))
    except Exception as e:
        print(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return float("nan")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:58s} {best * 1e3:9.3f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no_remat", action="store_true",
                    help="disable ReparamConv remat (A/B the checkpoint policy)")
    ap.add_argument("--remat_mode", default=None, choices=["full", "branches"],
                    help="ReparamConv remat variant (default: full recompute)")
    args = ap.parse_args()
    B, S = args.batch, args.size
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import (
        _forward_loss, create_train_state, train_step,
    )
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator

    print(f"batch={B} size={S} dtype={dtype.__name__} device={jax.devices()[0]}")

    rc_remat = False if args.no_remat else (args.remat_mode or True)
    model = LMNet(num_classes=2, dtype=None if args.fp32 else dtype,
                  rc_remat=rc_remat)
    state = create_train_state(
        model, jax.random.key(0), (1, 64, 64, 3), epochs=200, steps_per_epoch=100
    )
    x = jnp.ones((B, S, S, 3), jnp.float32)
    y = jnp.zeros((B, S, S), jnp.int32)
    key = jax.random.key(1)
    cm0 = ConfusionAccumulator.init(2)

    # ---- full train step: carry the state through the chain so the
    # optimizer update (and with it the whole backward) is NOT dead code
    def full_chain(x):
        def body(i, carry):
            s, acc = carry
            s, loss, _ = train_step.__wrapped__(
                s, x + (acc * 1e-30).astype(x.dtype), y, key, cm0
            )
            return s, acc + loss
        _, acc = jax.lax.fori_loop(0, ITERS, body, (state, jnp.zeros(())))
        return acc

    gfull = jax.jit(full_chain)
    try:
        float(gfull(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(gfull(x))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{'full train_step (fwd+loss+bwd+adamw+bn+cm)':58s} {best * 1e3:9.3f} ms")
        print(f"{'':58s} -> {B / best:9.1f} img/s")
    except Exception as e:
        print(f"full train_step FAILED: {type(e).__name__}: {str(e)[:160]}")

    # ---- forward only ---------------------------------------------------
    def fwd_only(x):
        loss, _ = _forward_loss(
            state.params, state.batch_stats, state.apply_fn, x, y, key, True,
            (1.0, 4.0), (1.0, 4.0), 0.001,
        )
        return loss

    timeit("train-mode forward + loss", fwd_only, x)

    def fwd_bwd(x):
        grad_fn = jax.value_and_grad(
            lambda p, xx: _forward_loss(
                p, state.batch_stats, state.apply_fn, xx, y, key, True,
                (1.0, 4.0), (1.0, 4.0), 0.001,
            )[0]
        )
        loss, g = grad_fn(state.params, x)
        return loss + sum(jnp.sum(jnp.abs(l)).astype(loss.dtype)
                          for l in jax.tree.leaves(g)) * 0

    timeit("value_and_grad fwd+loss (no opt/metrics)", fwd_bwd, x)

    # eval-mode forward for contrast
    def eval_fwd(x):
        v = {"params": state.params, "batch_stats": state.batch_stats}
        return state.apply_fn(v, x, train=False)

    timeit("eval-mode forward (train graph)", eval_fwd, x)

    # ---- NAT in isolation at the 4 stage shapes -------------------------
    from lmnet_tpu.ops import nat as nat_xla
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat

    stages = [  # (H, C) of the 4 NAT inputs at input size S; heads=12 always
        (S, 12, 12), (S // 2, 24, 12), (S // 4, 48, 12), (S // 8, 96, 12)
    ]
    for H, C, heads in stages:
        q = jnp.ones((B, H, H * C), dtype)
        rpb = jnp.zeros((heads, 5, 5), jnp.float32)

        timeit(f"NAT fwd flat-pallas  H={H} C={C} h={heads}",
               lambda q: nat_flat(q, q, q, rpb, heads, C, H), q)

        def nat_xla_fn(q, H=H, C=C, heads=heads):
            qs = q.reshape(B, H, H, C)
            return nat_xla.neighborhood_attention(
                qs, qs, qs, rpb, 3, scale=float(C // heads) ** -0.5)

        timeit(f"NAT fwd xla          H={H} C={C} h={heads}", nat_xla_fn, q)

        def nat_bwd(q, H=H, C=C, heads=heads):
            f = lambda qq: jnp.sum(
                nat_flat(qq, qq, qq, rpb, heads, C, H).astype(jnp.float32))
            return jax.grad(f)(q)

        timeit(f"NAT fwd+bwd (custom_vjp->xla) H={H} C={C}", nat_bwd, q)

    # ---- one train-mode ReparamConv block -------------------------------
    from lmnet_tpu.models.blocks import ReparamConv

    rc = ReparamConv(24, 24, dtype=None if args.fp32 else dtype)
    xin = jnp.ones((B, S // 2, S // 2, 12), jnp.float32)
    rcv = rc.init(jax.random.key(0), xin, train=False)

    def rc_fwd(xin):
        out, _ = rc.apply(rcv, xin, train=True, mutable=["batch_stats"])
        return out

    timeit("ReparamConv train fwd (4-branch) 128^2 12->24", rc_fwd, xin)

    def rc_fwd_bwd(xin):
        f = lambda xx: jnp.sum(rc_fwd(xx).astype(jnp.float32))
        return jax.grad(f)(xin)

    timeit("ReparamConv train fwd+bwd        128^2 12->24", rc_fwd_bwd, xin)


if __name__ == "__main__":
    main()
