"""TPU micro-benchmark: int8-MXU NATT interiors (VERDICT r2 item 3 /
ROADMAP item 3).

The natt3/natt4 interiors (LN/qkv/proj/fc matmuls at C=12/24) are
HBM-bandwidth-bound: every materialized (B, H, W, C) activation at 256^2
x 12 B=128 is ~201 MB in bf16, and the matmuls' K/N dims are far below
the 128 MXU tile, so the MXU is idle either way.  int8 therefore is NOT
a FLOPs play here — it is a bandwidth play: quantize at the LN outputs
(where a STATIC amplitude bound exists: |LN_out| <= sqrt(C)*max|gamma| +
max|beta|, no extra data pass) so the quantize fuses into the LN fusion
and the qkv/fc1 dots read half the bytes.

Variants measured (natt4 256^2 C=12 and natt3 128^2 C=24, B=128):
  xla   — the serving `_natt` as-is (weight-sliced bf16 qkv)
  int8  — ln1 -> int8 (static scale) -> int8xint8 qkv dots -> bf16;
          ln2 -> int8 -> fc1; proj/fc2 stay bf16 (their inputs — NAT
          output, gelu output — have no static bound; a dynamic amax
          costs the extra HBM pass the scheme is trying to save).

Run: python -u perf/natt_int8_bench.py [B] [ITERS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def make_params(rng, C, heads=12):
    hd = C // heads if C >= heads else 1
    heads = C // hd

    def dense(cin, cout):
        return {
            "dense": {
                "kernel": jnp.asarray(rng.randn(cin, cout) * cin**-0.5, jnp.float32),
                "bias": jnp.asarray(rng.randn(cout) * 0.01, jnp.float32),
            }
        }

    def conv(cin, cout, k):
        return {
            "conv": {
                "kernel": jnp.asarray(
                    rng.randn(k, k, cin, cout) * (k * k * cin) ** -0.5, jnp.float32
                ),
                "bias": jnp.asarray(rng.randn(cout) * 0.01, jnp.float32),
            }
        }

    def ln(c):
        return {
            "scale": jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(c), jnp.float32),
        }

    return {
        "embed": {"proj": conv(C, C, 3)},
        "norm1": ln(C),
        "norm2": ln(C),
        "attn": {
            "qkv": dense(C, 3 * C),
            "proj": dense(C, C),
            "rpb": jnp.asarray(rng.randn(heads, 5, 5) * 0.1, jnp.float32),
        },
        "mlp": {"fc1": dense(C, 2 * C), "fc2": dense(2 * C, C)},
    }


def quant_w_percol(w):
    """Per-output-column symmetric int8 weight quantization (trace-cheap:
    weights are (C, 3C) at most)."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-8)
    w8 = jnp.round(w / s[None, :]).clip(-127, 127).astype(jnp.int8)
    return w8, s


def ln_static_scale(p):
    """Static bound on |LN output|: the normalized vector has L2 norm
    sqrt(C) so per-element |x_hat| <= sqrt(C-1); scale by gamma, shift by
    beta."""
    c = p["scale"].shape[0]
    bound = float(np.sqrt(c - 1)) * jnp.max(jnp.abs(p["scale"])) + jnp.max(
        jnp.abs(p["bias"])
    )
    return jnp.maximum(bound, 1e-8) / 127.0


def _ln_q8(p, x, s_in):
    """LayerNorm emitting int8 with the static scale (quantize fuses into
    the LN elementwise chain -> the materialized tensor is int8)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["scale"] + p["bias"]
    return jnp.round(y / s_in).clip(-127, 127).astype(jnp.int8)


def _dense_i8(x8, w8, s_in, s_col, bias, out_dtype):
    acc = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (s_in * s_col) + bias).astype(out_dtype)


def natt_int8(p, x, num_heads, nat_backend):
    """int8-interior variant of serve.engine._natt (qkv + fc1 dots)."""
    from lmnet_tpu.serve.engine import _conv, _dense, _ln
    from lmnet_tpu.models.blocks import gelu

    emb = _conv(p["embed"]["proj"], x)
    C = emb.shape[-1]
    heads = num_heads if C % num_heads == 0 else C

    s1 = ln_static_scale(p["norm1"])
    ln1_8 = _ln_q8(p["norm1"], emb, s1)
    wq = p["attn"]["qkv"]["dense"]["kernel"]
    bq = p["attn"]["qkv"]["dense"]["bias"]
    w8, sc = quant_w_percol(wq)
    q = _dense_i8(ln1_8, w8[:, :C], s1, sc[:C], bq[:C], x.dtype)
    k = _dense_i8(ln1_8, w8[:, C : 2 * C], s1, sc[C : 2 * C], bq[C : 2 * C], x.dtype)
    v = _dense_i8(ln1_8, w8[:, 2 * C :], s1, sc[2 * C :], bq[2 * C :], x.dtype)

    rpb = p["attn"]["rpb"]
    Bb, H, W, _ = q.shape
    if nat_backend == "flat":
        from lmnet_tpu.ops.pallas.nat_flat import nat_flat

        nat = nat_flat(
            q.reshape(Bb, H, W * C), k.reshape(Bb, H, W * C),
            v.reshape(Bb, H, W * C), rpb, heads, C, W,
        ).reshape(Bb, H, W, C)
    else:
        from lmnet_tpu.ops.nat import neighborhood_attention

        nat = neighborhood_attention(q, k, v, rpb, 3)
    att = _dense(p["attn"]["proj"], nat) + emb

    s2 = ln_static_scale(p["norm2"])
    ln2_8 = _ln_q8(p["norm2"], att, s2)
    w1 = p["mlp"]["fc1"]["dense"]["kernel"]
    b1 = p["mlp"]["fc1"]["dense"]["bias"]
    w18, sc1 = quant_w_percol(w1)
    h = gelu(_dense_i8(ln2_8, w18, s2, sc1, b1, att.dtype))
    return _dense(p["mlp"]["fc2"], h) + att


def chain_time(fn, x0):
    @jax.jit
    def run(x):
        def body(i, carry):
            return carry * 0.999 + fn(carry)

        return jax.lax.fori_loop(0, ITERS, body, x)

    jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.serve.engine import _natt

    rng = np.random.RandomState(0)
    for H, W, C in [(256, 256, 12), (128, 128, 24)]:
        p = make_params(rng, C)
        x0 = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)

        f_ref = lambda x: _natt(p, x, 12, "flat")
        f_i8 = lambda x: natt_int8(p, x, 12, "flat")

        # numeric drift of the int8 interiors (single application)
        r = np.asarray(jax.jit(f_ref)(x0[:2]).astype(jnp.float32))
        g = np.asarray(jax.jit(f_i8)(x0[:2]).astype(jnp.float32))
        rel = np.abs(r - g).mean() / (np.abs(r).mean() + 1e-9)

        tr = chain_time(f_ref, x0)
        ti = chain_time(f_i8, x0)
        print(
            f"natt {H}x{W} C={C}: bf16 {tr:7.2f} ms  int8 {ti:7.2f} ms "
            f"({(tr - ti) / tr * 100:+.1f}%)  mean rel err {rel:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
