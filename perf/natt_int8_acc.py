"""Segmentation-level accuracy characterization of natt_int8 (VERDICT r4
ask #5): the +0.6% e2e serving knob shipped with only "~1-2% mean
activation error"; this measures what that means at the SEGMENTATION
level — pixel argmax flip rate and synthetic-task Dice delta vs bf16 at
256^2 B=128 — without real data (none in this container).

Protocol: load the convergence-parity trained weights
(perf/convergence_parity.py --save-params; trained to ~0.9 val Dice on
the synthetic blob task), generate a fresh 256^2 synthetic test set from
the same distribution, and compare deploy_forward(natt_int8=False) vs
(natt_int8=True) on identical inputs:

  * argmax flip rate        — fraction of pixels whose predicted class
                              changes under int8 interiors
  * Dice (bf16) vs Dice (int8) on the synthetic masks — the delta is the
                              segmentation-level cost to weigh against
                              the 0.5-pt north-star budget

Results recorded in BASELINE.md next to the +0.6% perf number.

Usage: python perf/natt_int8_acc.py [--params /tmp/conv_parity_params.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "perf"))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def load_params(path):
    import flax.traverse_util as tu

    z = np.load(path)
    p = {}
    s = {}
    for k in z.files:
        tgt, key = (p, k[2:]) if k.startswith("p/") else (s, k[2:])
        tgt[tuple(key.split("/"))] = jnp.asarray(z[k])
    return {
        "params": tu.unflatten_dict(p),
        "batch_stats": tu.unflatten_dict(s),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/tmp/conv_parity_params.npz")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from convergence_parity import binary_scores, cm_from_preds, make_synthetic_dataset
    from lmnet_tpu.models import structural_reparam
    from lmnet_tpu.serve.engine import deploy_forward

    if not os.path.exists(args.params):
        sys.exit(
            f"{args.params} not found — run perf/convergence_parity.py with "
            "--save-params first (the characterization needs TRAINED weights; "
            "argmax flips of a random-init model are meaningless)"
        )
    variables = load_params(args.params)
    dv = structural_reparam(variables)

    # fresh test set from the same distribution, at full 256^2
    images, masks = make_synthetic_dataset(args.n, args.size, seed=20260821)
    x = jnp.asarray(images, jnp.bfloat16)

    logits_bf = np.asarray(deploy_forward(dv, x, nat_backend="flat"))
    logits_i8 = np.asarray(
        deploy_forward(dv, x, nat_backend="flat", natt_int8=True)
    )
    pred_bf = logits_bf.argmax(-1)
    pred_i8 = logits_i8.argmax(-1)

    flip = float((pred_bf != pred_i8).mean())
    d_bf, i_bf = binary_scores(cm_from_preds(pred_bf, masks))
    d_i8, i_i8 = binary_scores(cm_from_preds(pred_i8, masks))
    # activation-level error for continuity with the old help text
    act_err = float(
        np.abs(logits_i8 - logits_bf).mean() / (np.abs(logits_bf).mean() + 1e-9)
    )

    print(f"n={args.n} @{args.size}^2, trained weights: {args.params}")
    print(f"pixel argmax flip rate : {100*flip:.4f} %")
    print(f"Dice bf16 {100*d_bf:.3f}  int8 {100*d_i8:.3f}  "
          f"delta {100*(d_i8-d_bf):+.3f} pts")
    print(f"IoU  bf16 {100*i_bf:.3f}  int8 {100*i_i8:.3f}  "
          f"delta {100*(i_i8-i_bf):+.3f} pts")
    print(f"mean relative logit error: {100*act_err:.2f} %")


if __name__ == "__main__":
    main()
