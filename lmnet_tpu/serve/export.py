"""Serialized serving artifacts: the re-parameterized LM-Net deploy graph
exported to StableHLO via ``jax.export``.

This is the deployment story the reference lacks (its ``switch_to_deploy``
still needs the Python model classes at serve time — ``core/modules.py``):
here the fused deploy forward is traced ONCE with the checkpoint's weights
baked in as constants and serialized to a single self-contained blob. The
serving process needs jax (or anything that can run StableHLO) and the
blob — no model code, no Flax, no checkpoint format.

Exports use the pure-XLA op formulations (``nat_backend='xla'``,
``rc_backend='xla'``): unlike the Pallas kernels they lower for every
platform, so one artifact can target CPU and TPU. The Pallas-fused paths
remain a runtime choice inside the live engine (``deploy_forward``).

The batch dimension is exported symbolically by default, so one artifact
serves any batch size; spatial dims are static (the NAT window/halo layout
is shape-specialized, matching the engine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmnet_tpu.serve.engine import deploy_forward


def export_deploy(
    variables: dict,
    img_size: int = 256,
    num_heads: int = 12,
    batch: int | None = None,
    dtype=jnp.bfloat16,
    natt_int8: bool = False,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize the deploy forward for ``variables`` (a
    ``structural_reparam`` output) to a StableHLO artifact.

    ``batch=None`` exports a symbolic batch dimension (any batch size at
    run time); an int pins it.  ``platforms=None`` targets the current
    backend plus 'tpu' and 'cpu' (duplicates removed) so the artifact is
    portable; pass an explicit tuple to narrow it.
    """
    if platforms is None:
        cur = jax.default_backend()
        platforms = tuple(dict.fromkeys((cur, "cpu", "tpu")))

    def fn(x):
        return deploy_forward(
            variables, x, num_heads=num_heads,
            nat_backend="xla", rc_backend="xla", natt_int8=natt_int8,
        )

    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), dtype)
    exported = jax.export.export(jax.jit(fn), platforms=list(platforms))(spec)
    return bytes(exported.serialize())


def load_deploy(blob: bytes):
    """Deserialize an :func:`export_deploy` artifact into a callable
    ``fn(x) -> logits`` running under jit on the current backend."""
    exported = jax.export.deserialize(blob)
    return jax.jit(exported.call)


def save_deploy(path: str, variables: dict, **kw) -> str:
    """Export and write the artifact to ``path``; returns the path."""
    blob = export_deploy(variables, **kw)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_deploy_file(path: str):
    with open(path, "rb") as f:
        return load_deploy(f.read())
