"""Device-mesh parallelism: the real implementation of what the reference's
``utils/distributed_utils.py`` scaffolds (NCCL init / all-reduce / rank
helpers, reference :7-70 — latent, never wired in).

TPU-native mapping (SURVEY §5.8):
  init_process_group/NCCL  -> jax.sharding.Mesh over ICI; no init dance
  all_reduce(mean)         -> automatic: grads of a sharded-batch loss under
                              jit ARE the global gradients (XLA inserts the
                              psum); nothing to call
  rank / world_size        -> jax.process_index() / jax.process_count()
  is_main_process          -> process_index() == 0 (gates checkpoint/CSV IO)
  DistributedSampler       -> shard the batch over the 'data' mesh axis
  --syncBN                 -> free under jit: a mean over a sharded batch
                              axis is already the global mean

The mesh has two axes:
  'data'    — batch-dimension data parallelism
  'spatial' — optional sharding of the image H dimension: the vision twin of
              sequence parallelism. XLA's SPMD partitioner inserts the k//2
              halo exchanges for convs and the NAT edge-pad windows
              automatically, riding ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_spatial: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_spatial
    assert n_data * n_spatial == n, (
        f"mesh {n_data}x{n_spatial} != {n} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for NHWC image batches: B over 'data', H over 'spatial'."""
    spec = P("data", "spatial" if spatial else None)
    return NamedSharding(mesh, spec)


def label_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    return batch_sharding(mesh, spatial)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, images, labels, spatial: bool = True):
    """Place a host batch onto the mesh, sharded over data (+spatial).

    Axes that don't divide evenly (e.g. a ragged tail eval batch) fall back
    to replication on that axis — correctness is preserved, only the tail
    batch loses parallelism.

    Multi-host: each process passes its HOST-LOCAL batch (its manifest
    shard — see cli ``_datasets``) and it becomes this process's slice of
    the global array via ``make_array_from_process_local_data``; a plain
    ``device_put`` onto a global sharding would raise on non-addressable
    devices (and silently assumes every host holds identical data).
    The global batch is then world_size * local_batch.
    """
    n_data = mesh.shape["data"]
    n_spatial = mesh.shape["spatial"]
    if jax.process_count() > 1:
        b_ok = images.shape[0] * jax.process_count() % n_data == 0
        h_ok = spatial and images.shape[1] % n_spatial == 0
        spec = P("data" if b_ok else None, "spatial" if h_ok else None)
        sh = NamedSharding(mesh, spec)
        # np.asarray syncs device-resident inputs back to host here (the
        # on-device augment output) — acceptable for correctness; if a
        # real multi-host profile shows this bounce, hoist shard_batch
        # before the augment pipeline so raw host batches shard directly.
        return (
            jax.make_array_from_process_local_data(sh, np.asarray(images)),
            jax.make_array_from_process_local_data(sh, np.asarray(labels)),
        )
    b_ok = images.shape[0] % n_data == 0
    h_ok = spatial and images.shape[1] % n_spatial == 0
    spec = P("data" if b_ok else None, "spatial" if h_ok else None)
    sh = NamedSharding(mesh, spec)
    return jax.device_put(images, sh), jax.device_put(labels, sh)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
