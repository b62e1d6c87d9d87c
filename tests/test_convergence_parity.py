"""Regression pin for the full-protocol convergence-parity harness
(perf/convergence_parity.py — the round-5 PASS artifact, PARITY.md).

Runs both sides for 2 epochs on a tiny task and asserts the per-epoch
loss trajectories agree to the tolerance the full 48-epoch run relies
on. This keeps the harness itself honest (transplant wiring, recipe
alignment, deterministic batch order) without re-running the 80-minute
protocol."""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two full-graph CPU compiles (~4 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harness():
    spec = importlib.util.spec_from_file_location(
        "convergence_parity", os.path.join(REPO, "perf", "convergence_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("convergence_parity", mod)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/core"), reason="reference not mounted"
)
def test_convergence_harness_sides_agree():
    import flax
    import jax
    import jax.numpy as jnp

    cp = _load_harness()
    from test_full_model_parity import _transplant
    from lmnet_tpu.models import LMNet

    n, size, batch, epochs = 8, 48, 4, 2
    images, masks = cp.make_synthetic_dataset(n, size)
    data = (images[:-4], masks[:-4], images[-4:], masks[-4:])

    model = LMNet(num_classes=2, gelu_exact=True, nat_backend="xla", rc_remat=False)
    variables = flax.core.unfreeze(
        model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)
    )
    sd = _transplant(variables)

    logs = {"ours": [], "torch": []}

    def log(msg):
        side = "ours" if "[ours" in msg else ("torch" if "[torch" in msg else None)
        if side and "loss" in msg:
            logs[side].append(float(msg.split("loss")[1].split()[0]))

    cp.run_ours(variables, data, epochs, batch, log)
    cp.run_torch(sd, data, epochs, batch, log)
    assert len(logs["ours"]) == len(logs["torch"]) == epochs
    # same init + same batches + same recipe => same last-step-of-epoch loss
    np.testing.assert_allclose(logs["ours"], logs["torch"], rtol=5e-3)
