"""Jitted train/eval steps and optimization state.

TPU-native counterpart of the reference engine (``utils/train_eval_utils.py``
``train_one_epoch``/``evaluate`` and the optimizer/scheduler setup at
``train.py:156-160``):
  * one fused, jitted ``train_step`` — forward, CE(weight,ls)+Dice loss,
    backward, AdamW update, BN running-stat update, and on-device metric
    accumulation, with donated state (no per-step host syncs at all);
  * AdamW(lr 1e-3, wd 1e-4) + per-epoch CosineAnnealingLR(eta_min 1e-6),
    reproduced exactly as an Optax schedule over the global step;
  * the AMP analogue is a bf16 compute policy on the model (params fp32).

The same step function runs single-chip or multi-chip: parallelism comes
from `jax.sharding` annotations on the inputs/state (see
``lmnet_tpu.parallel``), never from a different code path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lmnet_tpu.losses import cross_entropy_loss, dice_loss
from lmnet_tpu.metrics.confusion import confusion_matrix


class TrainState(struct.PyTreeNode):
    """Train state: params + BN stats + optimizer state + step counter."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def cosine_epoch_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, eta_min: float = 1e-6
):
    """torch CosineAnnealingLR(T_max=epochs, eta_min), stepped per *epoch*
    (constant within an epoch), as the reference does (train.py:160, :211)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * epoch / epochs))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def make_optimizer(
    base_lr: float = 1e-3,
    weight_decay: float = 1e-4,
    epochs: int = 200,
    steps_per_epoch: int = 1,
    eta_min: float = 1e-6,
) -> optax.GradientTransformation:
    """AdamW with the reference's hyperparameters; weight decay applies to
    every parameter (torch AdamW default — no bias/norm masking)."""
    sched = cosine_epoch_schedule(base_lr, epochs, steps_per_epoch, eta_min)
    return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: Sequence[int],
    tx: optax.GradientTransformation | None = None,
    **tx_kwargs,
) -> TrainState:
    # One jitted init program instead of op-by-op eager dispatch: on a
    # remote-TPU backend each eager op pays a full host<->device round trip
    # (measured 0.4 s/op through the tunnel), turning the ~2000-op init
    # into minutes; under jit it is a single program.
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros(input_shape, jnp.float32), train=False)
    )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx or make_optimizer(**tx_kwargs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.jit(tx.init)(params),
        apply_fn=model.apply,
        tx=tx,
    )


def _forward_loss(
    params,
    batch_stats,
    apply_fn,
    images,
    labels,
    rng,
    train: bool,
    ce_weight,
    dice_weight,
    label_smoothing,
):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        logits, mutated = apply_fn(
            variables,
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        new_stats = mutated["batch_stats"]
    else:
        logits = apply_fn(variables, images, train=False)
        new_stats = batch_stats
    ce = cross_entropy_loss(logits, labels, ce_weight, label_smoothing)
    if train:
        loss = ce + dice_loss(logits, labels, dice_weight)
    else:
        loss = ce  # reference evaluate() uses CE only (train_eval_utils.py:187)
    return loss, (logits, new_stats)


@partial(
    jax.jit,
    static_argnames=("num_classes", "ce_weight", "dice_weight", "label_smoothing"),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    cm: jnp.ndarray,
    num_classes: int = 2,
    ce_weight: tuple = (1.0, 4.0),
    dice_weight: tuple = (1.0, 4.0),
    label_smoothing: float = 0.001,
):
    """One optimization step. Returns (new_state, loss, new_confusion)."""
    # the reference hard-codes CE/Dice weight [1, 4] (train.py:157) — valid
    # only for 2 classes; multiclass runs fall back to uniform weights
    # (None = unweighted, the losses' native convention)
    if ce_weight is not None and len(ce_weight) != num_classes:
        ce_weight = (1.0,) * num_classes
    if dice_weight is not None and len(dice_weight) != num_classes:
        dice_weight = (1.0,) * num_classes
    step_rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
    (loss, (logits, new_stats)), grads = grad_fn(
        state.params,
        state.batch_stats,
        state.apply_fn,
        images,
        labels,
        step_rng,
        True,
        ce_weight,
        dice_weight,
        label_smoothing,
    )
    new_state = state.apply_gradients(grads, new_stats)
    preds = jnp.argmax(logits, axis=-1)
    cm = cm + confusion_matrix(preds, labels, num_classes)
    return new_state, loss, cm


@partial(
    jax.jit,
    static_argnames=("num_classes", "ce_weight", "label_smoothing"),
)
def eval_step(
    state: TrainState,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    cm: jnp.ndarray,
    num_classes: int = 2,
    ce_weight: tuple = (1.0, 4.0),
    label_smoothing: float = 0.001,
):
    """One eval step (CE loss only, like reference evaluate).
    Returns (loss, updated confusion, argmax preds). Preds stay on device
    unless the caller fetches them (e.g. for HD95) — no extra forward."""
    if ce_weight is not None and len(ce_weight) != num_classes:  # see train_step
        ce_weight = (1.0,) * num_classes
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits = state.apply_fn(variables, images, train=False)
    loss = cross_entropy_loss(logits, labels, ce_weight, label_smoothing)
    preds = jnp.argmax(logits, axis=-1)
    cm = cm + confusion_matrix(preds, labels, num_classes)
    return loss, cm, preds
