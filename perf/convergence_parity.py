"""Full-protocol convergence parity on a learnable synthetic task
(VERDICT r4 ask #1 — the strongest Dice-parity proxy this container allows).

Trains BOTH frameworks — our jitted train path and the reference's torch
source (/root/reference/train.py:156-241 recipe) — from the SAME
transplanted init on the SAME synthetic segmentation dataset with the
exact reference protocol:

  AdamW(lr 1e-3, wd 1e-4) + CosineAnnealingLR(T_max=epochs, eta_min=1e-6)
  stepped per epoch; loss = CE(weight [1,4], label_smoothing 0.001)
  + DiceLoss(weight [1,4]); BN momentum 0.1; best-val-IoU checkpoint
  selection (train.py:210,231); dropout/augmentation OFF on both sides
  (framework RNGs cannot be aligned).

Unlike the 6-step trajectory test (tests/test_full_model_parity.py:315),
this exercises what the protocol actually selects on: many-epoch cosine
decay, BN running stats over hundreds of steps, and best-val-IoU
selection. Pass criterion (recorded in PARITY.md): best-val Dice gap
< 0.5 pts and IoU gap similar.

The task is deliberately non-saturating (low-contrast blobs + noise) so
both sides land in the ~0.75-0.95 Dice range where a real optimization
gap would show, instead of both hitting 1.0 trivially.

Usage:  python perf/convergence_parity.py [--epochs 48] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# synthetic learnable segmentation task
# ---------------------------------------------------------------------------


def make_synthetic_dataset(n: int = 64, size: int = 64, seed: int = 10086):
    """Low-contrast elliptical blobs on textured noise. Learnable (the blobs
    have a consistent chroma shift) but not trivial (shift is ~0.6 sigma of
    the background noise, boundaries are soft)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    images = np.empty((n, size, size, 3), np.float32)
    masks = np.empty((n, size, size), np.uint8)
    for i in range(n):
        base = rng.uniform(-0.5, 0.5, (1, 1, 3))
        img = base + rng.randn(size, size, 3) * 0.35
        m = np.zeros((size, size), bool)
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.uniform(0.2 * size, 0.8 * size, 2)
            ay, ax = rng.uniform(0.08 * size, 0.22 * size, 2)
            th = rng.uniform(0, np.pi)
            dy, dx = yy - cy, xx - cx
            u = dy * np.cos(th) + dx * np.sin(th)
            v = -dy * np.sin(th) + dx * np.cos(th)
            m |= (u / ay) ** 2 + (v / ax) ** 2 < 1.0
        # consistent chroma shift inside blobs (+R -B), moderate contrast
        img[m] += np.array([0.22, 0.05, -0.18])
        img += rng.randn(size, size, 3) * 0.05
        images[i] = img.astype(np.float32)
        masks[i] = m.astype(np.uint8)
    return images, masks


def binary_scores(cm: np.ndarray) -> tuple[float, float]:
    """(dice, iou) for the foreground class from a 2x2 confusion matrix
    cm[truth, pred] — the reference's selection metric is binary Jaccard
    (train.py:210,231)."""
    tp = cm[1, 1]
    fp = cm[0, 1]
    fn = cm[1, 0]
    dice = 2.0 * tp / max(2.0 * tp + fp + fn, 1e-12)
    iou = tp / max(tp + fp + fn, 1e-12)
    return float(dice), float(iou)


def cm_from_preds(pred: np.ndarray, truth: np.ndarray) -> np.ndarray:
    idx = truth.reshape(-1) * 2 + pred.reshape(-1)
    return np.bincount(idx, minlength=4).reshape(2, 2).astype(np.float64)


def epoch_batches(n_train: int, batch: int, epoch: int, seed: int = 42):
    """Deterministic per-epoch shuffle shared verbatim by both sides."""
    order = np.random.RandomState(seed + epoch).permutation(n_train)
    return [order[i : i + batch] for i in range(0, n_train - batch + 1, batch)]


# ---------------------------------------------------------------------------
# our side: the real jitted train path (dropout off)
# ---------------------------------------------------------------------------


def run_ours(variables, data, epochs: int, batch: int, log, save_params=None):
    import jax
    import jax.numpy as jnp

    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import TrainState, make_optimizer, train_step

    xtr, ytr, xva, yva = data
    model = LMNet(num_classes=2, gelu_exact=True, nat_backend="xla", rc_remat=False)
    steps_per_epoch = len(epoch_batches(len(xtr), batch, 0))

    apply_det = lambda v, x, **kw: model.apply(v, x, deterministic=True, **kw)
    tx = make_optimizer(
        base_lr=1e-3, weight_decay=1e-4, epochs=epochs,
        steps_per_epoch=steps_per_epoch,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree.map(jnp.array, variables["params"]),
        batch_stats=jax.tree.map(jnp.array, variables["batch_stats"]),
        opt_state=tx.init(variables["params"]),
        apply_fn=apply_det,
        tx=tx,
    )

    @jax.jit
    def eval_logits(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )

    history = []
    key = jax.random.key(0)
    for ep in range(epochs):
        for idx in epoch_batches(len(xtr), batch, ep):
            cm = ConfusionAccumulator.init(2)
            state, loss, cm = train_step(
                state, jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx]), key, cm
            )
        cm_val = np.zeros((2, 2))
        for s in range(0, len(xva), batch):
            logits = np.asarray(
                eval_logits(state.params, state.batch_stats, jnp.asarray(xva[s : s + batch]))
            )
            cm_val += cm_from_preds(logits.argmax(-1), yva[s : s + batch])
        dice, iou = binary_scores(cm_val)
        history.append((dice, iou))
        log(f"  [ours ] epoch {ep + 1:3d}/{epochs}  loss {float(loss):.4f}  "
            f"val dice {dice:.4f}  iou {iou:.4f}")
    if save_params:
        # flat npz of the final params+batch_stats — reused by
        # perf/natt_int8_acc.py for segmentation-level int8 error
        import flax.traverse_util as tu

        flat = {
            "p/" + "/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.params)).items()
        }
        flat.update({
            "s/" + "/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.batch_stats)).items()
        })
        np.savez(save_params, **flat)
        log(f"saved trained params -> {save_params}")
    return history


# ---------------------------------------------------------------------------
# reference side: the torch source with the same recipe
# ---------------------------------------------------------------------------


def run_torch(torch_sd, data, epochs: int, batch: int, log):
    import torch
    import torch.nn as tnn

    from test_full_model_parity import _load_reference_lmnet

    LM_Net = _load_reference_lmnet()
    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utils.loss import DiceLoss  # the reference's own loss source

    xtr, ytr, xva, yva = data
    torch.manual_seed(0)
    tmodel = LM_Net(3, 2)
    missing, unexpected = tmodel.load_state_dict(torch_sd, strict=False)
    assert not unexpected, unexpected
    for m in tmodel.modules():  # dropout off on both sides
        if isinstance(m, tnn.Dropout):
            m.p = 0.0

    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=1e-6)
    ce_fn = tnn.CrossEntropyLoss(weight=torch.tensor([1.0, 4.0]), label_smoothing=0.001)
    dice_fn = DiceLoss(2)

    def to_t(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    history = []
    for ep in range(epochs):
        tmodel.train()
        for idx in epoch_batches(len(xtr), batch, ep):
            out = tmodel(to_t(xtr[idx]))
            yt = torch.from_numpy(ytr[idx].astype(np.int64))
            loss = ce_fn(out, yt) + dice_fn(
                out, yt.unsqueeze(1).float(), weight=[1.0, 4.0], softmax=True
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
        sched.step()  # reference steps the LR per epoch (train.py:211)
        tmodel.eval()
        cm_val = np.zeros((2, 2))
        with torch.no_grad():
            for s in range(0, len(xva), batch):
                out = tmodel(to_t(xva[s : s + batch]))
                pred = out.argmax(1).numpy()
                cm_val += cm_from_preds(pred, yva[s : s + batch])
        dice, iou = binary_scores(cm_val)
        history.append((dice, iou))
        log(f"  [torch] epoch {ep + 1:3d}/{epochs}  loss {float(loss):.4f}  "
            f"val dice {dice:.4f}  iou {iou:.4f}")
    return history


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--quick", action="store_true", help="3-epoch smoke")
    ap.add_argument("--side", choices=["both", "ours", "torch"], default="both")
    ap.add_argument("--out", default=None, help="write JSON result here")
    ap.add_argument("--save-params", default=None,
                    help="npz path for the trained jax params (natt_int8_acc.py)")
    ap.add_argument("--seed", type=int, default=0,
                    help="offsets the dataset seed and the init key "
                         "(robustness re-runs)")
    args = ap.parse_args()
    if args.quick:
        args.epochs, args.n = 3, 16

    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

    import jax
    import jax.numpy as jnp

    from test_full_model_parity import _transplant
    from lmnet_tpu.models import LMNet

    images, masks = make_synthetic_dataset(args.n, args.size, seed=10086 + args.seed)
    n_val = max(args.n // 4, args.batch)
    data = (images[:-n_val], masks[:-n_val], images[-n_val:], masks[-n_val:])
    log(f"dataset: {len(data[0])} train / {n_val} val @ {args.size}^2, "
        f"fg fraction {masks.mean():.3f}")

    model = LMNet(num_classes=2, gelu_exact=True, nat_backend="xla", rc_remat=False)
    variables = model.init(
        jax.random.key(args.seed), jnp.zeros((1, args.size, args.size, 3)),
        train=False,
    )
    import flax

    variables = flax.core.unfreeze(variables)
    torch_sd = _transplant(variables)  # BEFORE training (train_step donates)

    result = {"epochs": args.epochs, "n": args.n, "size": args.size}
    if args.side in ("both", "ours"):
        log("training OURS (jitted train_step, reference recipe)...")
        ours = run_ours(variables, data, args.epochs, args.batch, log,
                        save_params=args.save_params)
        bi = int(np.argmax([h[1] for h in ours]))
        result["ours"] = {
            "best_epoch": bi + 1, "best_val_iou": ours[bi][1],
            "best_val_dice": ours[bi][0], "history": ours,
        }
        log(f"OURS best: epoch {bi + 1}  dice {ours[bi][0]:.4f}  iou {ours[bi][1]:.4f}")
    if args.side in ("both", "torch"):
        log("training REFERENCE (torch source, same init/batches/recipe)...")
        ref = run_torch(torch_sd, data, args.epochs, args.batch, log)
        bi = int(np.argmax([h[1] for h in ref]))
        result["torch"] = {
            "best_epoch": bi + 1, "best_val_iou": ref[bi][1],
            "best_val_dice": ref[bi][0], "history": ref,
        }
        log(f"TORCH best: epoch {bi + 1}  dice {ref[bi][0]:.4f}  iou {ref[bi][1]:.4f}")

    if "ours" in result and "torch" in result:
        dgap = abs(result["ours"]["best_val_dice"] - result["torch"]["best_val_dice"])
        igap = abs(result["ours"]["best_val_iou"] - result["torch"]["best_val_iou"])
        result["dice_gap_pts"] = 100 * dgap
        result["iou_gap_pts"] = 100 * igap
        verdict = "PASS" if 100 * dgap < 0.5 else "FAIL"
        log(f"best-val Dice gap {100 * dgap:.3f} pts, IoU gap {100 * igap:.3f} pts "
            f"(budget 0.5) -> {verdict}")
        result["verdict"] = verdict
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=1)
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
