"""Worker for the 2-process multi-host dry run (tests/test_multihost.py).

Launched twice (RANK=0/1) with JAX_COORDINATOR_ADDRESS set. Each process
owns 2 virtual CPU devices (global mesh = 4), builds its HOST-LOCAL data
shard, and drives the real production path:

  init_distributed_mode (env rendezvous, reference RANK/WORLD_SIZE branch)
  -> make_mesh over the GLOBAL device set -> replicate(state)
  -> shard_batch (make_array_from_process_local_data branch)
  -> one jitted train_step (global grads/BN by construction)
  -> evaluate(cross_host=True): host-local shard eval + cross-process
     accumulator reduction (_allreduce_eval)

Prints one machine-readable RESULT line the parent test parses.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jb

_jb.clear_backends()
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np

from lmnet_tpu.parallel import dist_utils


def main():
    dist_utils.init_distributed_mode()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    import jax.numpy as jnp

    from lmnet_tpu.metrics.confusion import ConfusionAccumulator
    from lmnet_tpu.models.lm_net import LMNet
    from lmnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from lmnet_tpu.train.engine import create_train_state, train_step
    from lmnet_tpu.train.loop import evaluate

    hw, bl = 32, 2  # image size, host-local batch
    model = LMNet(num_classes=2, filters=(4, 8, 16, 32, 64), num_heads=4)
    state = create_train_state(
        model, jax.random.key(0), (bl, hw, hw, 3), epochs=2, steps_per_epoch=1
    )
    mesh = make_mesh()  # all 4 global devices on 'data'
    state = replicate(mesh, state)

    # distinct host-local train shard per process (deterministic by rank)
    r = np.random.RandomState(100 + pid)
    x = r.rand(bl, hw, hw, 3).astype(np.float32)
    y = (r.rand(bl, hw, hw) > 0.5).astype(np.int32)
    xg, yg = shard_batch(mesh, x, y, spatial=False)
    assert xg.shape[0] == 2 * bl, xg.shape  # global batch = world * local

    cm = ConfusionAccumulator.init(2)
    with mesh:
        state, loss, cm = train_step(state, xg, yg, jax.random.key(1), cm)
    loss = float(loss)
    assert np.isfinite(loss)

    # host-local val shard (different data per process), cross-host eval
    rv = np.random.RandomState(200 + pid)
    vx = (rv.rand(bl, hw, hw, 3) * 255).astype(np.uint8)
    vy = (rv.rand(bl, hw, hw) > 0.5).astype(np.uint8)
    val_loss, metrics = evaluate(
        state, [(vx, vy)], num_classes=2, img_size=hw,
        mesh=mesh, spatial=False, cross_host=True,
    )

    print("RESULT " + json.dumps(
        {"pid": pid, "train_loss": loss, "val_loss": val_loss,
         "dice": metrics["dice"], "iou": metrics["iou"]}
    ), flush=True)


if __name__ == "__main__":
    main()
