"""Real 2-process multi-host dry run (ROADMAP item 5 / VERDICT-r2 weak #7).

Spawns two OS processes that rendezvous through jax.distributed (Gloo CPU
collectives), each owning 2 virtual CPU devices of a 4-device global mesh,
and drives the production path end-to-end: env rendezvous via the
reference's RANK/WORLD_SIZE convention -> global mesh -> replicated state
-> shard_batch(make_array_from_process_local_data) -> jitted train_step ->
evaluate(cross_host=True) with cross-process accumulator reduction.

Checks, in order of subtlety:
  1. both processes agree bitwise on the global train loss and the reduced
     eval metrics (the collectives really ran over both hosts' data);
  2. those numbers match a SINGLE-process run of the same math (4-device
     mesh, concatenated batch) — the multi-host path computes the same
     thing, not merely a consistent thing.
"""

import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier

import json
import os
import subprocess
import sys

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _launch(rank: int, port: int):
    env = dict(os.environ)
    env.update(
        RANK=str(rank),
        WORLD_SIZE="2",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_PLATFORMS="cpu",
    )
    # the worker pins its own XLA_FLAGS (2 devices per process)
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, WORKER], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{out[-2000:]}")


def test_two_process_cli_end_to_end(tmp_path):
    """The FULL CLI surface across 2 processes: env rendezvous from main(),
    per-host synthetic dataset sharding, global-mesh training, cross-host
    eval, collective Orbax checkpoint save (would deadlock if gated to the
    main process — Orbax's completion barrier needs every process), and
    main-process-only CSV writes."""
    out0, out1 = tmp_path / "out0", tmp_path / "out1"
    ckpt = tmp_path / "ckpt"
    for d in (out0, out1, ckpt):
        d.mkdir()
    common = [
        "-m", "lmnet_tpu.cli.train", "--synthetic", "--epochs", "1",
        "--batch_size", "4", "--img_size", "32",
        "--filters", "4,8,16,32,64", "--num_heads", "4",
        "--k_fold", "False", "--distributed", "True",
        "--ckpt_dir", str(ckpt),
    ]

    def launch(rank, out_dir):
        env = dict(os.environ)
        env.update(
            RANK=str(rank), WORLD_SIZE="2",
            JAX_COORDINATOR_ADDRESS="localhost:29481",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=REPO,
        )
        return subprocess.Popen(
            [sys.executable] + common + ["--out_dir", str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )

    p1 = launch(1, out1)
    p0 = launch(0, out0)
    o0, _ = p0.communicate(timeout=1400)
    o1, _ = p1.communicate(timeout=120)
    assert p0.returncode == 0, o0[-2000:]
    assert p1.returncode == 0, o1[-2000:]
    assert "fold 0 train end" in o0 and "fold 0 train end" in o1

    # CSV contract: exactly one 16-col row, written by process 0 only
    rows = (out0 / "LM_NetKvasir_0.csv").read_text().strip().splitlines()
    assert len(rows) == 1 and len(rows[0].split(",")) == 16, rows
    assert not list(out1.iterdir()), "non-main process wrote outputs"
    # rolling checkpoint exists (the collective save completed)
    assert (ckpt / "LM_NetKvasir_0_checkpoint").is_dir()
    # the two processes computed the same global epoch (loss lines match)
    line0 = [l for l in o0.splitlines() if "train_loss" in l]
    line1 = [l for l in o1.splitlines() if "train_loss" in l]
    assert line0 and line0 == line1


def test_two_process_train_and_eval_match_single_process():
    p1 = _launch(1, 29431)
    p0 = _launch(0, 29431)
    out0, _ = p0.communicate(timeout=1400)
    out1, _ = p1.communicate(timeout=120)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    r0, r1 = _result(out0), _result(out1)

    # 1. cross-process agreement (collectives ran; reduction is global)
    for k in ("train_loss", "val_loss", "dice", "iou"):
        assert r0[k] == r1[k], (k, r0, r1)

    # 2. single-process ground truth: same model, same global batch
    # (shard0 ++ shard1) on a 4-device mesh, same val shards evaluated
    # together. Must reproduce the multi-host numbers.
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models.lm_net import LMNet
    from lmnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from lmnet_tpu.train.engine import create_train_state, train_step
    from lmnet_tpu.train.loop import evaluate

    hw, bl = 32, 2
    model = LMNet(num_classes=2, filters=(4, 8, 16, 32, 64), num_heads=4)
    state = create_train_state(
        model, jax.random.key(0), (bl, hw, hw, 3), epochs=2, steps_per_epoch=1
    )
    mesh = make_mesh(n_data=4, n_spatial=1, devices=jax.devices()[:4])
    state = replicate(mesh, state)

    shards = []
    for pid in (0, 1):
        r = np.random.RandomState(100 + pid)
        shards.append((
            r.rand(bl, hw, hw, 3).astype(np.float32),
            (r.rand(bl, hw, hw) > 0.5).astype(np.int32),
        ))
    x = np.concatenate([s[0] for s in shards])
    y = np.concatenate([s[1] for s in shards])
    xg, yg = shard_batch(mesh, x, y, spatial=False)
    cm = ConfusionAccumulator.init(2)
    with mesh:
        state, loss, cm = train_step(state, xg, yg, jax.random.key(1), cm)
    np.testing.assert_allclose(float(loss), r0["train_loss"], rtol=1e-5)

    val = []
    for pid in (0, 1):
        rv = np.random.RandomState(200 + pid)
        val.append((
            (rv.rand(bl, hw, hw, 3) * 255).astype(np.uint8),
            (rv.rand(bl, hw, hw) > 0.5).astype(np.uint8),
        ))
    val_loss, metrics = evaluate(
        state, val, num_classes=2, img_size=hw,
        mesh=mesh, spatial=False, cross_host=False,
    )
    # f32 CE reduction order differs between the 2x2 and 1x4 topologies
    # (~5e-5 relative, measured); the count-based metrics match bitwise
    np.testing.assert_allclose(val_loss, r0["val_loss"], rtol=1e-3)
    np.testing.assert_allclose(metrics["dice"], r0["dice"], rtol=1e-5)
    np.testing.assert_allclose(metrics["iou"], r0["iou"], rtol=1e-5)
