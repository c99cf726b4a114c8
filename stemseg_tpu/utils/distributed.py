"""Process-level distributed helpers.

Behavioral reference: ``/root/reference/stemseg/utils/distributed.py:12-126``
(NCCL rank/world-size wrappers, barrier, loss-dict reduce). In the JAX
single-controller model most of that disappears:

* rank / world size -> ``jax.process_index`` / ``jax.process_count`` (hosts,
  not devices — each host drives all its local devices);
* the DDP gradient all-reduce is compiled into the jitted train step;
* ``reduce_dict`` (loss averaging to rank 0) is unnecessary because the loss
  is computed over globally sharded arrays — every host sees the global
  value; a ``pmean_dict`` helper is provided for explicitly sharded
  per-host scalars;
* ``synchronize`` (barrier) is only needed around host-side I/O; blocking on
  a device array provides the same ordering guarantee.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def is_distributed() -> bool:
    return jax.process_count() > 1


def synchronize():
    """Barrier across hosts: run a trivial global psum and block on it."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("stemseg_tpu.synchronize")


def pmean_dict(scalars: Dict[str, float]) -> Dict[str, float]:
    """Average a dict of host-local scalars across hosts (replacement for the
    reference's ``reduce_dict``; rarely needed — see module docstring)."""
    if jax.process_count() == 1:
        return dict(scalars)
    from jax.experimental import multihost_utils

    keys = sorted(scalars)
    values = np.asarray([float(scalars[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(values).sum(axis=0)
    return {k: float(v) / jax.process_count() for k, v in zip(keys, summed)}
