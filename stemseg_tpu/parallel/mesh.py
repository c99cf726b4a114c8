"""Device mesh and sharding layout.

TPU-native replacement for the reference's NCCL data parallelism
(``/root/reference/stemseg/training/main.py:346-360`` process-per-GPU DDP,
``utils/distributed.py`` collectives). Here there is one controller: a 1-D
``data`` mesh; the batch is sharded over it and parameters are replicated.
The gradient all-reduce the reference gets from DDP's backward hook
(``training/main.py:60-64``) is compiled into the jitted train step by XLA
(a ``psum`` over ICI), and loss logging that the reference does with
``dist.reduce`` (``utils/distributed.py:100-126``) falls out of computing
the loss on globally-sharded arrays.

The model is ~67M params — data parallelism is the only axis that pays
(SURVEY.md §2.8); the mesh helper still takes an ``axes`` spec so wider
meshes (e.g. ``("data", "model")``) can be formed when a head grows.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh`` and
the same code spans hosts (DCN between slices, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) > 1:
        raise NotImplementedError("only a 1-D data mesh is defined for this model")
    return Mesh(devices.reshape(n_devices), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the leading dim sharded over the
    data axis (one H2D transfer per shard).

    Multi-host: each process passes its LOCAL portion of the batch (the
    rank-sliced sampler output, ``training/main.py``) and the global array
    is assembled across processes — the analogue of the reference's
    rank-sliced ``DistributedSampler`` feeding per-rank DDP replicas."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree over the mesh — multi-host safe (every process
    must hold identical values, e.g. params built from the same PRNG seed,
    matching the reference's seed-42-before-init DDP convention,
    ``model_builder.py:252``)."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)
