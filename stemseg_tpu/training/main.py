"""Training CLI: ``python -m stemseg_tpu.training.main --model_dir D --cfg F``.

Behavioral reference: ``/root/reference/stemseg/training/main.py`` (Trainer
class, train loop ``:133-255``, auto-resume ``:313-319``, SIGINT/exception
checkpointing ``:328-343``). TPU-native differences:

* single controller — no process-per-GPU launcher; the data-parallel mesh
  spans all local devices (and all hosts after
  ``jax.distributed.initialize``), gradients all-reduce inside the jitted
  step; the reference's ``--local_rank`` / NCCL bootstrap disappears;
* gradient accumulation uses ``optax.MultiSteps`` with
  ``accumulate_steps = batch_size / (n_devices * max_samples_per_chip)``
  (reference ``optimizer_step_interval``, ``:140-157``);
* full-session checkpoints are msgpack pytrees (``checkpoint.py``); config
  snapshot saved next to them for inference to reload
  (reference ``:322-324``).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_trainer_objects(cfg, n_devices: int, remat_backbone: bool = False):
    """Model + state + sharded step (factored out for tests)."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.models import build_model
    from stemseg_tpu.parallel import create_mesh
    from stemseg_tpu.training.step import create_train_state, make_train_step

    model = build_model(cfg, for_training=True, remat_backbone=remat_backbone)

    per_chip = cfg.training.max_samples_per_chip
    global_batch = n_devices * per_chip
    accumulate_steps = max(1, int(round(cfg.training.batch_size / global_batch)))

    t = cfg.input.num_frames
    sample = jnp.zeros((1, t, 64, 96, 3), jnp.float32)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(42), sample,
                                   accumulate_steps=accumulate_steps)

    mesh = create_mesh(n_devices) if n_devices > 1 else None
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)
    return model, state, tx, step_fn, mesh, global_batch, accumulate_steps


class Trainer:
    def __init__(self, cfg, model_dir: str, args):
        import jax

        from stemseg_tpu.config import save_config
        from stemseg_tpu.training.checkpoint import (
            find_latest_checkpoint,
            restore_checkpoint,
        )
        from stemseg_tpu.training.interrupt import InterruptDetector
        from stemseg_tpu.training.logger import TrainingLogger

        self.cfg = cfg
        self.args = args
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        save_config(cfg, os.path.join(model_dir, "config.yaml"))

        n_devices = len(jax.devices())
        (self.model, self.state, self.tx, self.step_fn, self.mesh,
         self.global_batch, self.accumulate_steps) = build_trainer_objects(
            cfg, n_devices, remat_backbone=getattr(args, "remat", False))

        self.logger = TrainingLogger(os.path.join(model_dir, "logs"))
        self.interrupt = InterruptDetector()
        self.elapsed_iterations = 0
        self.total_iterations = cfg.training.max_iterations

        assert not (args.restore_session and args.initial_ckpt)
        restore_path = args.restore_session
        if restore_path is None and not args.no_resume:
            restore_path = find_latest_checkpoint(model_dir)

        if restore_path:
            print(f"Restoring session from {restore_path}")
            self.state, extra, step = restore_checkpoint(restore_path, self.state)
            self.elapsed_iterations = step
            if "logger" in extra:
                self.logger.load_state_dict(extra["logger"])
        elif args.initial_ckpt:
            # weights-only warm start for stage-2 configs (reference :86-88)
            print(f"Loading model weights from checkpoint at: {args.initial_ckpt}")
            self._load_initial_weights(args.initial_ckpt)

        if self.mesh is not None:
            from stemseg_tpu.parallel.mesh import replicated_sharding

            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))

    def _load_initial_weights(self, path: str):
        if path.endswith(".pth"):
            # reference torch checkpoint -> convert
            from stemseg_tpu.models.converter import (
                convert_state_dict,
                load_torch_state_dict,
                merge_variables,
            )

            sd = load_torch_state_dict(path)
            variables = merge_variables(
                {"params": self.state.params, "constants": self.state.constants},
                convert_state_dict(sd))
            self.state = self.state.replace(params=variables["params"],
                                            constants=variables["constants"])
        else:
            from stemseg_tpu.training.checkpoint import restore_checkpoint

            restored, _, _ = restore_checkpoint(path, self.state)
            self.state = self.state.replace(params=restored.params,
                                            constants=restored.constants)

    def backup_session(self) -> str:
        from stemseg_tpu.training.checkpoint import (
            cleanup_old_checkpoints,
            save_checkpoint,
        )

        path = save_checkpoint(self.model_dir, self.elapsed_iterations, self.state,
                               extra={"logger": self.logger.state_dict()})
        cleanup_old_checkpoints(self.model_dir, self.args.ckpts_to_keep)
        print(f"Checkpoint saved to: {path}")
        return path

    def make_loader(self, num_workers: int):
        from stemseg_tpu.data.samplers import (
            BatchSampler,
            IterationBasedBatchSampler,
            ShardedSampler,
        )
        from stemseg_tpu.training.datasets import create_training_dataset
        from stemseg_tpu.training.loader import PrefetchLoader

        # total sub-iterations = optimizer iterations * accumulate steps
        total_subiters = self.total_iterations * self.accumulate_steps
        dataset = create_training_dataset(self.cfg, total_subiters * self.global_batch)

        import jax

        sampler = ShardedSampler(len(dataset),
                                 num_replicas=jax.process_count(),
                                 rank=jax.process_index())
        batch_sampler = IterationBasedBatchSampler(
            BatchSampler(sampler, self.global_batch),
            num_iterations=total_subiters,
            start_iter=self.elapsed_iterations * self.accumulate_steps)
        from stemseg_tpu.config import resolve_max_instances

        return PrefetchLoader(dataset, batch_sampler,
                              max_instances=resolve_max_instances(self.cfg),
                              overflow=self.cfg.training.instance_overflow,
                              num_workers=num_workers)

    def start(self):
        import jax
        import jax.numpy as jnp

        from stemseg_tpu.parallel import shard_batch
        from stemseg_tpu.training.interrupt import InterruptException
        from stemseg_tpu.training.loader import device_prefetch

        self.interrupt.start()
        loader = self.make_loader(self.args.num_cpu_workers)

        def place(batch):
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                            if k in ("images", "masks", "ignore_masks",
                                     "category_ids")}
            if self.mesh is not None:
                device_batch = shard_batch(device_batch, self.mesh)
            return device_batch

        print(f"Commencing/resuming training from iteration {self.elapsed_iterations + 1}")
        last_time = time.time()
        sub_iter = 0
        metrics_accum = {}

        # bounded jax.profiler capture: trace starts after the compile
        # iteration and stops after --profile_steps optimizer steps
        profile_dir = getattr(self.args, "profile", None)
        profile_steps = getattr(self.args, "profile_steps", 5)
        profile_started = profile_stopped = profile_dir is None

        try:
            # one-deep device prefetch: batch n+1's H2D overlaps step n
            for device_batch in device_prefetch(iter(loader), place):
                if not profile_started and sub_iter >= self.accumulate_steps:
                    jax.profiler.start_trace(profile_dir)
                    profile_started = True
                    profile_until = self.elapsed_iterations + profile_steps

                self.state, metrics = self.step_fn(self.state, device_batch)
                sub_iter += 1
                for k, v in metrics.items():
                    metrics_accum.setdefault(k, []).append(v)

                if sub_iter % self.accumulate_steps != 0:
                    continue

                self.elapsed_iterations += 1
                if (profile_started and not profile_stopped
                        and self.elapsed_iterations >= profile_until):
                    # drain in-flight work so the trace captures full steps
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profile_stopped = True
                    print(f"Profile trace written to {profile_dir}")
                self.interrupt.raise_if_interrupted()

                if self.elapsed_iterations % self.args.display_interval == 0:
                    # one host sync per display interval
                    scalars = {k: float(np.mean([np.asarray(x) for x in vs[-self.accumulate_steps:]]))
                               for k, vs in metrics_accum.items()}
                    now = time.time()
                    sec_per_iter = (now - last_time) / self.args.display_interval
                    last_time = now
                    eta = self.logger.compute_eta(self.elapsed_iterations,
                                                  self.total_iterations)
                    print(self.logger.format_console_line(
                        self.elapsed_iterations, self.total_iterations, scalars,
                        sec_per_iter, eta))

                if self.elapsed_iterations % self.args.summary_interval == 0:
                    scalars = {k: float(np.mean([float(np.asarray(x)) for x in vs]))
                               for k, vs in metrics_accum.items()}
                    self.logger.add_scalars(scalars, self.elapsed_iterations)
                    metrics_accum = {}

                if self.elapsed_iterations % self.args.save_interval == 0:
                    self.backup_session()

                if self.elapsed_iterations >= self.total_iterations:
                    break

        except InterruptException:
            print("Interrupt signal received — checkpointing before exit")
            self.backup_session()
            return
        except Exception:
            print("Exception during training — checkpointing before re-raise")
            self.backup_session()
            raise
        finally:
            if profile_started and not profile_stopped:
                import jax.profiler

                jax.profiler.stop_trace()
                profile_stopped = True

        print("Training complete")
        self.backup_session()


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train STEm-Seg (TPU)")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--cfg", type=str, required=True,
                        help="preset name (e.g. davis_1) or YAML path")
    parser.add_argument("--restore_session", type=str)
    parser.add_argument("--initial_ckpt", type=str,
                        help=".ckpt (ours) or .pth (reference, auto-converted)")
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--display_interval", type=int, default=5)
    parser.add_argument("--summary_interval", type=int, default=10)
    parser.add_argument("--save_interval", type=int, default=10000)
    parser.add_argument("--num_cpu_workers", type=int, default=8)
    parser.add_argument("--ckpts_to_keep", type=int, default=2)
    parser.add_argument("--profile", metavar="DIR", required=False,
                        help="capture a jax.profiler trace of --profile_steps "
                             "optimizer steps (after the compile step) into "
                             "DIR; view with TensorBoard's profile plugin")
    parser.add_argument("--profile_steps", type=int, default=5)
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the backbone (HBM for recompute; "
                             "use for 16-frame full-res configs)")
    return parser


def main(argv=None):
    args = make_parser().parse_args(argv)

    from stemseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # train-step compiles are slow via remote-compile

    from stemseg_tpu.config import load_config, load_preset

    if os.path.exists(args.cfg):
        cfg = load_config(args.cfg)
    else:
        cfg = load_preset(args.cfg)

    trainer = Trainer(cfg, args.model_dir, args)
    trainer.start()


if __name__ == "__main__":
    main()
