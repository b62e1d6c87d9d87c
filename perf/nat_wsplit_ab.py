"""W-split stripe A/B at 512^2 (VERDICT r4 ask #8 — 512^2 serving sits at
89% of pixel-linear; the round-4 VMEM-budget lift bounded the residual
stripe cost at ~11%; this settles whether splitting the NAT problem along
W recovers any of it).

Formulation: run nat_flat on two HALF-WIDTH sub-problems with halo
columns. Kept output columns are interior in the sub-problem, so base
window shifts read the halo and produce exactly the full-width result;
true image borders (col 0 / W-1) remain borders of their sub-problem.
Lane alignment: W'*C must stay a multiple of 128, so the halo is padded
to 16 columns at C=12 (W 512 -> 272+272) and 8 at C=24 (W 256 -> 136+136)
— ~6% duplicated compute, plus XLA slice/concat copies for the overlapping
q/k/v halves and the output stitch.

Measures the bare-kernel ladder (all 4 stages at 512^2 B=128) and e2e
512^2 serving. Correctness pinned against the unsplit kernel first.

Usage: python perf/nat_wsplit_ab.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 10
HEADS = 12

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
    return _RTT


def timeit(fn, *args):
    rtt = host_rtt()

    def chain(*a):
        def body(i, acc):
            y = fn(a[0] + (acc * 1e-30).astype(a[0].dtype), *a[1:])
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    g = jax.jit(chain)
    float(g(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
    return best


def halo_cols(C: int) -> int:
    """Smallest halo h such that (W/2 + h)*C % 128 == 0 stays satisfiable:
    we need W' ≡ 0 mod (128 / gcd(C, 128))."""
    import math

    m = 128 // math.gcd(C, 128)
    # halo of at least 1 column each side, rounded up to keep W' % m == 0
    return m


def nat_wsplit(q, k, v, rpb, heads, C, W):
    """Two half-width nat_flat calls with lane-aligned halo columns."""
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat

    B, H, WC = q.shape
    h = halo_cols(C)  # halo+pad columns (one side), keeps W'*C % 128 == 0
    Wh = W // 2
    Wp = Wh + h  # sub-problem width

    def split(t):
        t4 = t.reshape(B, H, W, C)
        left = t4[:, :, :Wp].reshape(B, H, Wp * C)
        right = t4[:, :, W - Wp :].reshape(B, H, Wp * C)
        return left, right

    ql, qr = split(q)
    kl, kr = split(k)
    vl, vr = split(v)
    ol = nat_flat(ql, kl, vl, rpb, heads, C, Wp)
    orr = nat_flat(qr, kr, vr, rpb, heads, C, Wp)
    out_l = ol.reshape(B, H, Wp, C)[:, :, :Wh]
    out_r = orr.reshape(B, H, Wp, C)[:, :, Wp - Wh :]
    return jnp.concatenate([out_l, out_r], axis=2).reshape(B, H, WC)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    S = 512
    bf16 = jnp.bfloat16
    from lmnet_tpu.ops.pallas.nat_flat import nat_flat

    # correctness at small scale, f32
    rng = np.random.RandomState(0)
    for C, W in ((12, 64), (24, 32)):
        H = W
        q, k, v = (jnp.asarray(rng.randn(2, H, W * C), jnp.float32) for _ in range(3))
        rpb = jnp.asarray(rng.randn(HEADS, 5, 5) * 0.1, jnp.float32)
        a = np.asarray(nat_flat(q, k, v, rpb, HEADS, C, W))
        b = np.asarray(nat_wsplit(q, k, v, rpb, HEADS, C, W))
        err = np.abs(a - b).max()
        print(f"correctness C={C} W={W}: max|diff| {err:.2e}")
        assert err < 1e-4, err

    # bare-kernel ladder at 512^2
    f = (12, 24, 48, 96)
    print(f"\nbare-kernel ladder 512^2 B={B}:")
    tot_base = tot_split = 0.0
    for i, C in enumerate(f):
        scale = S // (2 ** i)
        q = jnp.ones((B, scale, scale * C), bf16)
        rpb = jnp.zeros((HEADS, 5, 5), jnp.float32)
        t_base = timeit(lambda q, rpb=rpb, C=C, scale=scale:
                        nat_flat(q, q, q, rpb, HEADS, C, scale), q)
        t_split = timeit(lambda q, rpb=rpb, C=C, scale=scale:
                         nat_wsplit(q, q, q, rpb, HEADS, C, scale), q)
        tot_base += t_base
        tot_split += t_split
        print(f"  {scale:3d}^2 C={C:2d}: base {t_base*1e3:7.3f} ms | "
              f"wsplit {t_split*1e3:7.3f} ms ({100*(t_split/t_base-1):+.1f}%)")
    print(f"  ladder: base {tot_base*1e3:.2f} ms | wsplit {tot_split*1e3:.2f} ms")


if __name__ == "__main__":
    main()
