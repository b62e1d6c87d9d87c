"""TPU micro-bench: 2x align_corners=True upsample formulations, fwd and
fwd+bwd, at the LM-Net decoder shapes (B=128).

  einsum   — current default (ops/resize.py::_resize_axis bf16 branch):
             per-axis interpolation-matrix einsums in NHWC; XLA inserts
             hidden (B,H,C,W) transposes around the W contraction (seen
             as ~2.5 ms copies in the train xplane, fwd AND bwd).
  sandwich — ONE explicit transpose to (B,C,H,W), both lerp contractions
             as clean minor/second-minor matmuls, ONE transpose back.
             Bets that 2 explicit transposes beat XLA's hidden ones.

Run: python -u perf/upsample_ab.py [B] [ITERS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def sandwich(x):
    from lmnet_tpu.ops.resize import _lerp_matrix

    b, h, w, c = x.shape
    mh = jnp.asarray(_lerp_matrix(h, 2 * h, True), x.dtype)  # (2h, h)
    mw = jnp.asarray(_lerp_matrix(w, 2 * w, True), x.dtype)  # (2w, w)
    t = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    t = jnp.einsum("uh,bchw->bcuw", mh, t)
    t = jnp.einsum("bchw,vw->bchv", t, mw)
    return jnp.transpose(t, (0, 2, 3, 1))


def einsum_up(x):
    from lmnet_tpu.ops.resize import upsample2x_align_corners

    return upsample2x_align_corners(x)


def chain_time(fn, x0):
    @jax.jit
    def run(x):
        def body(i, carry):
            y = fn(carry)
            if y.shape == carry.shape:  # grad step: already input-shaped
                return carry * 0.999 + y
            # fold back to input size so the chain is closed: mean-pool 2x
            return carry * 0.999 + y.reshape(
                x.shape[0], x.shape[1], 2, x.shape[2], 2, x.shape[3]
            ).mean((2, 4))

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
    rng = np.random.RandomState(0)
    # parity first (TPU matmuls default to bf16 mantissas, so ~1e-2 tol)
    xs = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sandwich(xs)), np.asarray(einsum_up(xs)), rtol=3e-2, atol=3e-2
    )
    print("parity ok", flush=True)

    for H, C in [(16, 192), (32, 96), (64, 48), (128, 24)]:
        x0 = jnp.asarray(rng.randn(B, H, H, C) * 0.5, jnp.bfloat16)
        for name, fn in (("einsum", einsum_up), ("sandwich", sandwich)):
            tf = chain_time(fn, x0)

            def gstep(x, fn=fn):
                return jax.grad(
                    lambda v: jnp.sum(fn(v).astype(jnp.float32) ** 2) * 1e-6
                )(x).astype(x.dtype)

            tg = chain_time(gstep, x0)
            print(
                f"{H}x{H} C={C} {name:9s}: fwd {tf:6.2f} ms  f+bwd {tg:6.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
