"""Checkpoint/resume with the reference's 4-field contract, via Orbax.

Reference contract (``train.py:176-181, 225-241``): every epoch save
``{epoch, state_dict, optimizer, lr_schedule}`` to
``{model}{dataset}_{fold}_checkpoint`` (rolling) plus a best-val-IoU copy
``...best_{fold}``; resume restores all four and continues at epoch+1.

Here the four logical fields map to:
  epoch       -> explicit int (and the step counter inside the state)
  state_dict  -> {params, batch_stats}
  optimizer   -> opt_state
  lr_schedule -> derived from step (the Optax schedule is a pure function of
                 the global step, so restoring the step restores the LR) —
                 stored as metadata for inspection.

Saves are atomic (Orbax writes to a temp dir then renames), which is the
preemption-safe TPU-idiomatic upgrade over torch.save.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _path(ckpt_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(ckpt_dir, name))


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    state,
    epoch: int,
    best_iou: float = 0.0,
    extra: dict[str, Any] | None = None,
) -> None:
    """Save a rolling checkpoint (overwrites previous one of this name).

    ``best_iou`` persists the best-val-IoU watermark so ``--resume`` cannot
    regress the best checkpoint — the reference resets it to 0 on resume
    (``train.py:231-238``), a defect this rebuild fixes per its stated
    policy (SURVEY Appendix A).
    """
    path = _path(ckpt_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {
            "epoch": epoch,
            "best_iou": float(best_iou),
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        if extra:
            payload["extra"] = extra
        if jax.process_count() > 1:
            # The CLI gates saves to the main process, but a state replicated
            # over the GLOBAL mesh is not fully addressable on any single
            # process — Orbax would require an all-process collective save
            # (and its barrier would deadlock a one-process call). The state
            # is always fully replicated (params/opt/BN), so pull the local
            # replica to host numpy and save purely locally instead.
            import numpy as _np

            payload = jax.tree.map(
                lambda a: _np.asarray(jax.device_get(a))
                if isinstance(a, jax.Array) else a,
                payload,
            )
        ckptr.save(path, payload, force=True)


def restore_checkpoint(ckpt_dir: str, name: str, state):
    """Restore into an abstract state template. Returns
    ``(state, epoch, best_iou)``.

    Single-process: restores to HOST numpy first, then moves the whole
    tree to device in one batched ``jax.device_put`` (shardings taken
    from the template state). Restoring straight to device would issue
    one blocking transfer per array — ~25 ms tunnel RTT x ~400 arrays on
    a remote-TPU setup.

    Multi-process (``jax.process_count() > 1``): ``device_put`` of a full
    host array onto non-addressable devices raises, so Orbax restores
    sharded directly from the template's shardings instead (slower on the
    tunnel, correct everywhere).
    """
    path = _path(ckpt_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        template = {
            "epoch": 0,
            "best_iou": 0.0,
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        if jax.process_count() > 1:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
            abstract["epoch"] = 0
            abstract["best_iou"] = 0.0
            restored = ckptr.restore(path, abstract)
            epoch = int(restored.pop("epoch"))
            best_iou = float(restored.pop("best_iou"))
            return (
                state.replace(
                    step=restored["step"],
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    opt_state=restored["opt_state"],
                ),
                epoch,
                best_iou,
            )
        # shapes/dtypes only (no shardings) -> orbax returns host numpy
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype)
            if hasattr(x, "dtype")
            else x,
            template,
        )
        # epoch / best_iou are python scalars in the payload
        abstract["epoch"] = 0
        abstract["best_iou"] = 0.0
        restored = ckptr.restore(path, abstract)
    epoch = int(restored.pop("epoch"))
    best_iou = float(restored.pop("best_iou"))
    template.pop("epoch")
    template.pop("best_iou")
    shardings = jax.tree.map(
        lambda t: t.sharding if hasattr(t, "sharding") else None, template
    )
    restored = jax.device_put(restored, shardings)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, epoch, best_iou


def checkpoint_exists(ckpt_dir: str, name: str) -> bool:
    return os.path.isdir(_path(ckpt_dir, name))
