"""Subprocess worker for the 2-process ``jax.distributed`` smoke test.

Models the reference's multi-process launcher protocol (one process per
device, ``/root/reference/stemseg/training/main.py:346-360,392-394``) on the
CPU backend: each process owns 2 local virtual devices, the 4-device global
mesh spans both processes, params are replicated from a shared seed (the
reference's seed-42-before-DDP convention) and the batch is assembled from
per-process local shards (rank-sliced sampler semantics).

Usage: dist_runner.py <process_id> <num_processes> <coordinator_port> \
       [local_device_count=2]
Prints one line: ``LOSS <float>``. With num_processes=1 the coordinator is
skipped (plain single-process run, used for the DDP-equivalence check).
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    n_local_req = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_req}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_procs,
            process_id=proc_id,
        )
    assert jax.process_count() == num_procs
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == num_procs * n_local, (n_global, n_local)

    import jax.numpy as jnp
    import numpy as np

    from stemseg_tpu.config import load_config
    from stemseg_tpu.models import build_model
    from stemseg_tpu.parallel import create_mesh, replicate, shard_batch
    from stemseg_tpu.training import create_train_state, make_train_step

    cfg = load_config({
        "input": {"num_frames": 2, "num_classes": 2},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"initial_lr": 0.01, "lr_decay_type": "none"},
    })
    model = build_model(cfg, for_training=True)

    i, t, h, w = 2, 2, 64, 96
    # deterministic GLOBAL batch; each process slices its local rows
    rng = np.random.RandomState(0)
    g = {
        "images": rng.randn(n_global, t, h, w, 3).astype(np.float32),
        "masks": np.zeros((n_global, i, t, h, w), np.float32),
        "ignore_masks": np.zeros((n_global, t, h, w), np.float32),
        "category_ids": np.ones((n_global, i), np.int32),
    }
    g["masks"][:, 0, :, 8:32, 16:48] = 1.0
    g["masks"][:, 1, :, 40:56, 56:88] = 1.0
    lo, hi = proc_id * n_local, (proc_id + 1) * n_local
    local = {k: v[lo:hi] for k, v in g.items()}

    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.zeros((1, t, h, w, 3), jnp.float32))

    mesh = create_mesh(n_global)
    step = make_train_step(model, cfg, tx, mesh=mesh, donate=False)
    state = replicate(state, mesh)
    sharded = shard_batch(local, mesh)
    new_state, metrics = step(state, sharded)
    jax.block_until_ready(metrics)
    assert int(np.asarray(new_state.step)) == 1
    # fully-replicated output — every process reads the same global loss
    print(f"LOSS {float(np.asarray(metrics['total'])):.6f}", flush=True)
    if num_procs > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
