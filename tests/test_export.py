"""Serialized serving artifact (serve/export.py): StableHLO roundtrip
parity against the live deploy engine, symbolic-batch reuse, and
multi-platform export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet, structural_reparam
from lmnet_tpu.serve import deploy_forward
from lmnet_tpu.serve.export import export_deploy, load_deploy


@pytest.fixture(scope="module")
def deploy_vars():
    m = LMNet(**TINY)
    vs = jax.jit(
        lambda k: m.init(k, jnp.zeros((1, TINY_HW, TINY_HW, 3)), train=False)
    )(jax.random.key(0))
    return structural_reparam(vs)


def test_export_roundtrip_matches_engine(deploy_vars, rng):
    """Deserialized artifact == live deploy_forward, and one symbolic-batch
    artifact serves multiple batch sizes."""
    blob = export_deploy(
        deploy_vars, img_size=TINY_HW, num_heads=TINY["num_heads"],
        dtype=jnp.float32, platforms=("cpu",),
    )
    assert isinstance(blob, bytes) and len(blob) > 1000
    fn = load_deploy(blob)
    for b in (1, 3):
        x = jnp.asarray(rng.randn(b, TINY_HW, TINY_HW, 3), jnp.float32)
        ref = deploy_forward(
            deploy_vars, x, num_heads=TINY["num_heads"],
            nat_backend="xla", rc_backend="xla",
        )
        out = fn(x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_export_multiplatform_serializes(deploy_vars):
    """Cross-platform export (cpu + tpu lowering from this host) produces a
    single artifact advertising both platforms."""
    blob = export_deploy(
        deploy_vars, img_size=TINY_HW, num_heads=TINY["num_heads"],
        dtype=jnp.float32, platforms=("cpu", "tpu"), batch=2,
    )
    exported = jax.export.deserialize(blob)
    assert set(exported.platforms) == {"cpu", "tpu"}
