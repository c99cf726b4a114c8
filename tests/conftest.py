"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(data-parallel pjit over a Mesh) can be exercised without TPU hardware —
this substitutes for the reference's missing distributed-test story
(SURVEY.md §4).

Set ``STEMSEG_TEST_TPU=1`` to keep the real TPU backend instead — this
un-skips the hardware-gated tests (Pallas kernels), e.g.
``STEMSEG_TEST_TPU=1 python -m pytest tests/ -k pallas``.

NOTE: the axon sitecustomize registers the TPU-tunnel backend and forces
``jax_platforms="axon,cpu"`` *programmatically*, so the ``JAX_PLATFORMS``
env var alone is NOT enough — we must override via ``jax.config.update``
after importing jax (before any backend is initialized).
"""

import os

_USE_TPU = os.environ.get("STEMSEG_TEST_TPU") == "1"

if not _USE_TPU:
    # Must happen before jax initializes its backends.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
