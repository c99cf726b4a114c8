"""Inference CLI: ``python -m stemseg_tpu.inference.main CKPT -o DIR
--dataset {davis,ytvis,kittimots}``.

Behavioral reference: ``/root/reference/stemseg/inference/main.py``. Drives
the full pipeline per sequence: frame loading (thread-pool prefetch) ->
sliding-window engine (backbone + 3D heads on device) -> dense clustering +
cross-window chaining -> dataset-specific output writer, and prints the same
model / clustering / overall fps report (:105-123) with image I/O and output
writing excluded via the Timer mechanism.

Config resolution: ``config.yaml`` next to the checkpoint if present, else
the dataset's default preset (davis_2 / youtube_vis / kitti_mots_2,
reference :185-198); CLI overrides for input dims, seediness thresholds and
frame overlap (:201-235).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

from stemseg_tpu.utils.timer import Timer

DATASET_PRESETS = {
    "davis": "davis_2",
    "ytvis": "youtube_vis",
    "kittimots": "kitti_mots_2",
}


def load_inference_cfg(model_path: str, dataset: str, min_dim: Optional[int],
                       max_dim: Optional[int], min_seediness_prob: Optional[float]):
    from stemseg_tpu.config import load_config, load_preset, merge

    cfg_file = os.path.join(os.path.dirname(model_path), "config.yaml")
    if os.path.exists(cfg_file):
        print(f"Loading config from {cfg_file}")
        cfg = load_config(cfg_file)
    else:
        assert dataset in DATASET_PRESETS, \
            "Invalid '--dataset'. Should be 'davis', 'ytvis' or 'kittimots'"
        print(f"Loading default preset {DATASET_PRESETS[dataset]}")
        cfg = load_preset(DATASET_PRESETS[dataset])

    # input-dim overrides keep the aspect limit ratio (reference :201-226)
    if min_dim or max_dim:
        ratio = cfg.input.max_dim / cfg.input.min_dim
        if min_dim and max_dim:
            new_min, new_max = min_dim, max_dim
        elif min_dim:
            new_min, new_max = min_dim, int(round(min_dim * ratio))
        else:
            new_min, new_max = int(round(max_dim / ratio)), max_dim
        cfg = merge(cfg, {"input": {"min_dim": new_min, "max_dim": new_max}})
        print(f"Network input image dimension limits: {new_min}, {new_max}")

    if min_seediness_prob:
        cfg = merge(cfg, {"clustering": {"min_seediness_prob": min_seediness_prob}})
    return cfg


def load_model_variables(cfg, model_path: str):
    """Build the model and load weights from a .ckpt (ours) or .pth
    (reference torch checkpoint, auto-converted)."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.models import build_model

    model = build_model(cfg, for_training=False)
    t = cfg.input.num_frames
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, 64, 96, 3), jnp.float32))

    if model_path.endswith(".pth"):
        from stemseg_tpu.models.converter import (
            convert_state_dict,
            load_torch_state_dict,
            merge_variables,
        )

        return merge_variables(init_vars, convert_state_dict(
            load_torch_state_dict(model_path)))

    from flax import serialization

    with open(model_path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    state = payload["state"] if "state" in payload else payload
    return {
        "params": serialization.from_state_dict(init_vars["params"], state["params"]),
        "constants": serialization.from_state_dict(init_vars["constants"], state["constants"]),
    }


class TrackGenerator:
    """Per-sequence orchestration (reference ``inference/main.py:52-182``)."""

    def __init__(self, cfg, dataset: str, variables, output_generator,
                 max_tracks: int, seediness_thresh: float = 0.25,
                 frame_overlap: int = -1, resize_embeddings: bool = False,
                 cpu_workers: int = 4, use_fused: bool = True,
                 bf16: bool = False, profile_clustering: bool = False,
                 mesh=None):
        import jax.numpy as jnp

        from stemseg_tpu.inference.clustering import (ClusterParams,
                                                      ClusterTimeLog,
                                                      cluster_window)
        from stemseg_tpu.inference.engine import InferenceEngine
        from stemseg_tpu.models.embedding_utils import get_nb_free_dims

        self.cfg = cfg
        self.dataset = dataset
        self.output_generator = output_generator
        self.max_tracks = max_tracks
        self.seediness_thresh = seediness_thresh
        self.cpu_workers = cpu_workers

        overlaps = {
            "davis": cfg.data.davis.inference_frame_overlap,
            "ytvis": cfg.data.youtube_vis.inference_frame_overlap,
            "kittimots": cfg.data.kitti_mots.inference_frame_overlap,
        }
        self.frame_overlap = frame_overlap if frame_overlap > 0 else overlaps[dataset]

        self.cluster_full_scale = cfg.training.loss_at_full_res or resize_embeddings
        self.mask_scale = 1 if self.cluster_full_scale else 4
        self.upscaled_inputs = self.cluster_full_scale

        self.semseg_output_type = {"kittimots": "argmax", "ytvis": "logits"}.get(
            dataset, "probs")

        self.engine = InferenceEngine(
            cfg, variables, dtype=jnp.bfloat16 if bf16 else None,
            semseg_resize_scale=4.0 if self.cluster_full_scale else 1.0)

        ccfg = cfg.clustering
        self.cluster_params = ClusterParams(
            primary_prob_thresh=ccfg.primary_prob_threshold,
            secondary_prob_thresh=ccfg.secondary_prob_threshold,
            min_seediness_prob=ccfg.min_seediness_prob,
            max_instances=ccfg.max_instances,
            n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
            free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds),
            secondary_assignment=ccfg.secondary_assignment,
        )

        def cluster_fn(emb, bw, seed, fg_mask, label_start):
            if self.cluster_full_scale:
                from stemseg_tpu.models.layers import upsample_trilinear

                emb = upsample_trilinear(emb[None], (1.0, 4.0, 4.0))[0]
                bw = upsample_trilinear(bw[None], (1.0, 4.0, 4.0))[0]
                seed = upsample_trilinear(seed[None, ..., None], (1.0, 4.0, 4.0))[0, ..., 0]
            return cluster_window(emb, bw, seed, fg_mask, self.cluster_params,
                                  label_start, time_log=self.cluster_time_log)

        # per-point-count duration buckets (reference ClustererBase,
        # clusterers.py:8-29) — profiling forces the streaming path since the
        # fused graph has no per-window boundary to time
        self.cluster_time_log = ClusterTimeLog() if profile_clustering else None
        if profile_clustering:
            use_fused = False

        from stemseg_tpu.inference.chainer import OnlineChainer

        self.chainer = OnlineChainer(cluster_fn,
                                     max_instances=ccfg.max_instances)

        # fused one-jit path: backbone+heads+clustering+association for the
        # whole sequence in ONE dispatch + one fetch — used for every
        # sequence with >= NUM_FRAMES frames; shorter sequences (with
        # front-padded duplicate frames) take the streaming path above
        from stemseg_tpu.inference.fused_pipeline import FusedSequencePipeline

        self.fused = FusedSequencePipeline(
            self.engine, self.cluster_params,
            cluster_full_scale=self.cluster_full_scale) if use_fused else None
        # data-parallel serving: one sequence per device over this mesh
        # (no reference analogue — the reference is single-GPU)
        self.mesh = mesh if (mesh is not None and use_fused) else None
        self.total_frames_processed = 0

    # ------------------------------------------------------------------

    @Timer.exclude_duration("inference", "postprocessing")
    def _load_frames(self, sequence):
        """Load RAW uint8 frames (a thread pool over cv2) — resize/normalize
        run on device (4x less transfer volume than preprocessed float32)."""
        import cv2
        from concurrent.futures import ThreadPoolExecutor

        paths = [os.path.join(sequence.base_dir, p) for p in sequence.image_paths]

        def read(path):
            im = cv2.imread(path, cv2.IMREAD_COLOR)
            if im is None:
                raise ValueError(f"No image found at path: {path}")
            return im

        with ThreadPoolExecutor(max_workers=self.cpu_workers) as pool:
            images = list(pool.map(read, paths))
        return np.stack(images), images[0].shape[:2]

    @Timer.log_duration("inference")
    def do_inference(self, frames, image_hw):
        from stemseg_tpu.inference.windows import get_subsequence_frames
        from stemseg_tpu.structures.geometry import compute_resize_params

        h0, w0 = image_hw
        new_w, new_h, _ = compute_resize_params(
            (w0, h0), self.cfg.input.min_dim, self.cfg.input.max_dim)
        windows, _ = get_subsequence_frames(
            frames.shape[0], self.cfg.input.num_frames, self.frame_overlap)
        return self.engine.infer_sequence(
            frames, windows, seediness_fg_threshold=self.seediness_thresh,
            semseg_output_type=self.semseg_output_type,
            resize_hw=(new_h, new_w))

    @Timer.log_duration("postprocessing")
    def do_clustering(self, out):
        fg_masks = np.asarray(out["fg_masks"])
        return self.chainer.process(fg_masks, out["windows"])

    @Timer.log_duration("inference")
    def do_fused(self, frames, image_hw):
        """One-dispatch path: the fused graph folds the clustering and
        stitching matmuls into the model graph, so the whole run is logged
        under the 'inference' timer ('postprocessing' stays ~0 — the
        per-stage split of the reference fps report does not exist here,
        only the overall fps is comparable)."""
        from stemseg_tpu.inference.windows import get_subsequence_frames
        from stemseg_tpu.structures.geometry import compute_resize_params

        h0, w0 = image_hw
        new_w, new_h, _ = compute_resize_params(
            (w0, h0), self.cfg.input.min_dim, self.cfg.input.max_dim)
        windows, _ = get_subsequence_frames(
            frames.shape[0], self.cfg.input.num_frames, self.frame_overlap)
        return self.fused.run(
            frames, windows, seediness_fg_threshold=self.seediness_thresh,
            semseg_output_type=self.semseg_output_type,
            resize_hw=(new_h, new_w),
            # the DAVIS writer ignores category masks — skip that transfer
            fetch_multiclass=self.dataset != "davis")

    def process_sequence(self, sequence, max_tracks: int):
        frames, image_hw = self._load_frames(sequence)
        self._process_loaded(sequence, frames, image_hw, max_tracks)

    def _process_loaded(self, sequence, frames, image_hw, max_tracks: int):
        if self.fused is not None and frames.shape[0] >= self.cfg.input.num_frames:
            labels, counts, lifetimes, _, category_masks = self.do_fused(
                frames, image_hw)
        else:
            out = self.do_inference(frames, image_hw)
            labels, counts, lifetimes, _ = self.do_clustering(out)
            category_masks = out["multiclass_masks"]
            if category_masks is not None:
                category_masks = np.asarray(category_masks)

        self.output_generator.process_sequence(
            sequence, labels, counts, lifetimes, category_masks,
            mask_scale=4, max_tracks=max_tracks,
            min_dim=self.cfg.input.min_dim, max_dim=self.cfg.input.max_dim)

        self.total_frames_processed += len(sequence)

    @Timer.log_duration("inference")
    def do_fused_batch(self, frames_list, windows_list, resize_hw):
        return self.fused.run_batch(
            frames_list, windows_list, self.mesh,
            seediness_fg_threshold=self.seediness_thresh,
            semseg_output_type=self.semseg_output_type, resize_hw=resize_hw,
            fetch_multiclass=self.dataset != "davis")

    def _start_mesh(self, todo):
        """Data-parallel serving: group sequences by raw resolution (one
        resize bucket per run_batch call), chunk to the mesh size, run one
        sequence per device; too-short sequences (front-padded duplicate
        windows) fall back to the per-sequence path."""
        from collections import defaultdict

        from stemseg_tpu.inference.windows import get_subsequence_frames
        from stemseg_tpu.structures.geometry import compute_resize_params

        n_dev = int(np.prod(self.mesh.devices.shape))
        groups = defaultdict(list)
        shorts = []
        for s in todo:
            (groups[tuple(s.image_dims)].append(s)
             if len(s) >= self.cfg.input.num_frames else shorts.append(s))

        done = 0
        for (h0, w0), seqs in groups.items():
            new_w, new_h, _ = compute_resize_params(
                (w0, h0), self.cfg.input.min_dim, self.cfg.input.max_dim)
            for i in range(0, len(seqs), n_dev):
                chunk = seqs[i:i + n_dev]
                loaded = [self._load_frames(s) for s in chunk]
                frames_list = [f for f, _ in loaded]
                windows_list = [get_subsequence_frames(
                    f.shape[0], self.cfg.input.num_frames,
                    self.frame_overlap)[0] for f in frames_list]
                print(f"Performing inference for sequences "
                      f"{done + 1}-{done + len(chunk)}/{len(todo)} "
                      f"({len(chunk)}-way data parallel)")
                results = self.do_fused_batch(frames_list, windows_list,
                                              (new_h, new_w))
                for seq, (labels, counts, lifetimes, _, mc) in zip(chunk,
                                                                   results):
                    self.output_generator.process_sequence(
                        seq, labels, counts, lifetimes, mc, mask_scale=4,
                        max_tracks=self.max_tracks,
                        min_dim=self.cfg.input.min_dim,
                        max_dim=self.cfg.input.max_dim)
                    self.total_frames_processed += len(seq)
                done += len(chunk)
        for i, s in enumerate(shorts):
            print(f"Performing inference for sequence "
                  f"{done + i + 1}/{len(todo)} (short, per-sequence)")
            self.process_sequence(s, self.max_tracks)

    def start(self, sequences, seqs_to_process: Optional[List[str]] = None):
        from concurrent.futures import ThreadPoolExecutor

        todo = [s for s in sequences
                if not seqs_to_process or str(s.id) in seqs_to_process]

        if self.mesh is not None:
            self._start_mesh(todo)
            self._print_fps_report()
            return

        # prefetch the NEXT sequence's frames while the device crunches the
        # current one (image I/O is excluded from the fps timers either way)
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            pending = prefetcher.submit(self._load_frames, todo[0]) if todo else None
            for i, sequence in enumerate(todo):
                print(f"Performing inference for sequence {i + 1}/{len(todo)}")
                frames, image_hw = pending.result()
                if i + 1 < len(todo):
                    pending = prefetcher.submit(self._load_frames, todo[i + 1])
                self._process_loaded(sequence, frames, image_hw, self.max_tracks)

        self._print_fps_report()

    def _print_fps_report(self):
        inf = max(Timer.get_duration("inference"), 1e-9)
        post = max(Timer.get_duration("postprocessing"), 1e-9)
        print("----------------------------------------------------")
        print(f"Model inference speed: {self.total_frames_processed / inf:.3f} fps")
        print(f"Clustering and postprocessing speed: "
              f"{self.total_frames_processed / post:.3f} fps")
        print(f"Overall speed: "
              f"{self.total_frames_processed / max(Timer.get_durations_sum(), 1e-9):.3f} fps")
        if self.cluster_time_log is not None:
            print("Clustering durations by point count "
                  "(points: calls, mean ms):")
            for pts, (n, mean_s) in self.cluster_time_log.summary().items():
                print(f"  {pts:>9d}: {n:4d} calls, {mean_s * 1e3:8.2f} ms")
            print(f"  average: {self.cluster_time_log.average_time * 1e3:.2f} ms")
        print("----------------------------------------------------")


def main(argv=None):
    parser = argparse.ArgumentParser(description="STEm-Seg TPU inference")
    parser.add_argument("model_path")
    parser.add_argument("--output_dir", "-o", required=False)
    parser.add_argument("--seqs", nargs="*", required=False)
    parser.add_argument("--dataset", "-d", required=True,
                        choices=list(DATASET_PRESETS))
    parser.add_argument("--max_tracks", type=int, required=False)
    parser.add_argument("--frame_overlap", "-fo", type=int, default=-1)
    parser.add_argument("--seediness_thresh", "-st", type=float, default=0.25)
    parser.add_argument("--min_dim", type=int, required=False)
    parser.add_argument("--max_dim", type=int, required=False)
    parser.add_argument("--resize_embeddings", action="store_true")
    parser.add_argument("--min_seediness_prob", "-msp", type=float, required=False)
    parser.add_argument("--save_vis", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="run the model forward in bfloat16 (params stay "
                             "fp32; clustering/averaging stay fp32)")
    parser.add_argument("--profile_clustering", action="store_true",
                        help="log per-window clustering durations bucketed "
                             "by point count (reference ClustererBase "
                             "semantics; forces the streaming path and a "
                             "sync per window)")
    parser.add_argument("--profile", metavar="DIR", required=False,
                        help="capture a jax.profiler device trace of the "
                             "whole run into DIR (view with TensorBoard's "
                             "profile plugin / xprof)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="serve one sequence per device over a mesh of "
                             "all visible devices (fused pipeline "
                             "run_batch); sequences are grouped by raw "
                             "resolution so each batch shares one compile")
    args = parser.parse_args(argv)

    from stemseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # fused-graph compiles are slow via remote-compile

    cfg = load_inference_cfg(args.model_path, args.dataset, args.min_dim,
                             args.max_dim, args.min_seediness_prob)

    output_dir = args.output_dir or os.path.join(
        os.path.dirname(args.model_path), "inference")
    if not os.path.isabs(output_dir):
        output_dir = os.path.join(os.path.dirname(args.model_path), output_dir)
    os.makedirs(output_dir, exist_ok=True)

    from stemseg_tpu.data.parsers import parse_generic_video_dataset
    from stemseg_tpu.data.paths import (
        DavisUnsupervisedPaths,
        KITTIMOTSPaths,
        YoutubeVISPaths,
    )
    from stemseg_tpu.inference.output_utils import (
        DavisOutputGenerator,
        KittiMOTSOutputGenerator,
        YoutubeVISOutputGenerator,
    )

    cluster_full_scale = cfg.training.loss_at_full_res or args.resize_embeddings

    if args.dataset == "davis":
        sequences, _ = parse_generic_video_dataset(
            DavisUnsupervisedPaths.trainval_base_dir(),
            DavisUnsupervisedPaths.val_vds_file())
        output_generator = DavisOutputGenerator(
            output_dir, save_visualization=args.save_vis,
            upscaled_inputs=cluster_full_scale)
        max_tracks = cfg.data.davis.max_inference_tracks
    elif args.dataset == "ytvis":
        sequences, meta_info = parse_generic_video_dataset(
            YoutubeVISPaths.val_base_dir(), YoutubeVISPaths.val_vds_file())
        output_generator = YoutubeVISOutputGenerator(
            output_dir, category_names=meta_info["category_labels"],
            save_visualization=args.save_vis, upscaled_inputs=cluster_full_scale)
        max_tracks = cfg.data.youtube_vis.max_inference_tracks
    else:
        sequences, _ = parse_generic_video_dataset(
            KITTIMOTSPaths.train_images_dir(), KITTIMOTSPaths.val_vds_file())
        output_generator = KittiMOTSOutputGenerator(
            output_dir, save_visualization=args.save_vis,
            upscaled_inputs=cluster_full_scale)
        max_tracks = cfg.data.kitti_mots.max_inference_tracks

    max_tracks = args.max_tracks or max_tracks

    variables = load_model_variables(cfg, args.model_path)
    mesh = None
    if args.data_parallel:
        import jax

        from stemseg_tpu.parallel import create_mesh

        mesh = create_mesh(jax.device_count())
    generator = TrackGenerator(
        cfg, args.dataset, variables, output_generator, max_tracks,
        seediness_thresh=args.seediness_thresh,
        frame_overlap=args.frame_overlap,
        resize_embeddings=args.resize_embeddings,
        bf16=args.bf16, profile_clustering=args.profile_clustering,
        mesh=mesh)

    import contextlib

    if args.profile:
        import jax

        trace_ctx = jax.profiler.trace(args.profile)
    else:
        trace_ctx = contextlib.nullcontext()
    with trace_ctx:
        generator.start(sequences, args.seqs)
    output_generator.save()
    print(f"Results saved to {output_dir}")


if __name__ == "__main__":
    main()
