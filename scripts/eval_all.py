"""One-command accuracy runbook: convert -> infer -> score, per dataset.

This is the command to run when hardware WITH the real datasets and the
released reference checkpoints exists (neither is present in the dev
environment — see BASELINE.md). It chains, per dataset family:

1. **convert** — implicit: the inference CLI accepts a reference ``.pth``
   directly and converts it on the fly (``models/converter.py``); pass our
   ``.ckpt`` files to skip conversion.
2. **infer** — ``stemseg_tpu.inference.main`` with the dataset's default
   config resolution, writing the official submission formats
   (reference ``inference/main.py:289-310`` CLI semantics).
3. **score** — ``stemseg_tpu.eval.main`` on the written results against
   the ground-truth JSONs (DAVIS J&F incl. recall/decay, YouTube-VIS
   AP/AP50/AP75/AP_S/M/L/AR@1/AR@10, KITTI-MOTS per-class sMOTSA).

Usage::

    python scripts/eval_all.py --models_dir /path/to/ckpts \
        --output_dir /tmp/eval_out [--datasets davis ytvis kittimots] \
        [--bf16] [--seqs SEQ ...]

``--models_dir`` must hold ``davis.pth``, ``youtube_vis.pth`` and
``kitti_mots.pth`` (the reference's released checkpoints, README.md:33-35)
or equivalently-named ``.ckpt`` files. Dataset roots come from the usual
env vars (``stemseg_tpu/data/paths.py``): ``DAVIS_BASE_DIR``,
``YOUTUBE_VIS_BASE_DIR``, ``KITTIMOTS_BASE_DIR`` +
``STEMSEG_JSON_ANNOTATIONS_DIR``.

Writes ``RESULTS.md`` into ``--output_dir`` with per-dataset metric tables
and wall-times, and prints one JSON line with everything.

Expected wall-times on one v5e chip (from the measured fused-pipeline
rate of ~105 fps on-chip, BASELINE.md): DAVIS'19 val (30 seqs, ~2k frames)
~5 min; YouTube-VIS val (302 seqs, ~13k frames) ~25 min; KITTI-MOTS val
(9 seqs, ~3k frames at 1948-wide geometry) ~15 min — plus scoring, which
is host-side and dataset-sized (minutes).

YT-VIS note: the in-repo scorer needs ground-truth tracks, so it scores
against the *validation-set* JSON if annotations are available; the
official val server accepts ``results.zip`` (written next to
``results.json``) unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# dataset key -> (checkpoint basenames tried in order, required env vars)
DATASETS = {
    "davis": (("davis.pth", "davis.ckpt"),
              ("DAVIS_BASE_DIR", "STEMSEG_JSON_ANNOTATIONS_DIR")),
    "ytvis": (("youtube_vis.pth", "youtube_vis.ckpt"),
              ("YOUTUBE_VIS_BASE_DIR", "STEMSEG_JSON_ANNOTATIONS_DIR")),
    "kittimots": (("kitti_mots.pth", "kitti_mots.ckpt"),
                  ("KITTIMOTS_BASE_DIR", "STEMSEG_JSON_ANNOTATIONS_DIR")),
}

RESULTS_HEADER = """# Accuracy results

Produced by ``python scripts/eval_all.py`` on {date}.

Checkpoints: ``{models_dir}``. Targets (BASELINE.md): DAVIS'19-unsup
J&F ~= 64.7, YouTube-VIS AP ~= 34.6 (R-101), KITTI-MOTS sMOTSA per paper —
parity with the released reference checkpoints scored by the official
protocols.
"""


def _find_ckpt(models_dir: str, names) -> str:
    for name in names:
        p = os.path.join(models_dir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"none of {names} found in {models_dir}")


def run_dataset(dataset: str, ckpt: str, out_root: str, args) -> dict:
    """Run inference + scoring for one dataset family; returns metrics."""
    from stemseg_tpu.eval.main import main as eval_main
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.utils.timer import Timer

    out_dir = os.path.join(out_root, dataset)
    cli = [ckpt, "-o", out_dir, "--dataset", dataset]
    if args.bf16:
        cli.append("--bf16")
    if args.seqs:
        cli += ["--seqs"] + list(args.seqs)
    if args.frame_overlap is not None:
        # required when the checkpoint's NUM_FRAMES is below the dataset's
        # default overlap (the CLI asserts overlap < window length)
        cli += ["--frame_overlap", str(args.frame_overlap)]

    Timer.reset()
    t0 = time.perf_counter()
    inference_main.main(cli)
    infer_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    eval_cli = ["--dataset", dataset,
                "--results", os.path.join(out_dir, "results")]
    if dataset == "ytvis":
        # the ytvis scorer reads the writer's results.json directly
        eval_cli = ["--dataset", dataset,
                    "--results", os.path.join(out_dir, "results.json")]
    if args.seqs:
        eval_cli += ["--seqs"] + list(args.seqs)
    metrics = eval_main(eval_cli)
    score_s = time.perf_counter() - t0

    return {"metrics": metrics, "inference_s": round(infer_s, 1),
            "scoring_s": round(score_s, 1), "output_dir": out_dir}


def write_results_md(path: str, models_dir: str, per_dataset: dict):
    lines = [RESULTS_HEADER.format(
        date=time.strftime("%Y-%m-%d %H:%M"), models_dir=models_dir)]
    for ds, res in per_dataset.items():
        lines.append(f"\n## {ds}\n")
        lines.append(f"Inference {res['inference_s']} s, scoring "
                     f"{res['scoring_s']} s -> ``{res['output_dir']}``\n")
        lines.append("| Metric | Value |")
        lines.append("|---|---|")
        for k, v in res["metrics"].items():
            if isinstance(v, float):
                lines.append(f"| {k} | {v:.4f} |")
            else:
                lines.append(f"| {k} | {v} |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--models_dir", required=True,
                        help="directory with davis.pth / youtube_vis.pth / "
                             "kitti_mots.pth (or .ckpt equivalents)")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--datasets", nargs="*",
                        default=list(DATASETS),
                        choices=list(DATASETS))
    parser.add_argument("--seqs", nargs="*",
                        help="restrict to these sequence ids (smoke runs)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute in the forward (parity-tested)")
    parser.add_argument("--frame_overlap", type=int, default=None,
                        help="override the dataset's window overlap (must "
                             "be < the model's NUM_FRAMES)")
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    per_dataset = {}
    for ds in args.datasets:
        names, env_vars = DATASETS[ds]
        missing = [v for v in env_vars if not os.environ.get(v)]
        if missing:
            print(f"[eval_all] SKIP {ds}: env vars not set: {missing}",
                  file=sys.stderr)
            continue
        try:
            ckpt = _find_ckpt(args.models_dir, names)
        except FileNotFoundError as exc:
            # skip-and-continue, like the missing-env-var case: the runbook
            # scores whatever checkpoints are present
            print(f"[eval_all] SKIP {ds}: {exc}", file=sys.stderr)
            continue
        print(f"[eval_all] {ds}: {ckpt}", file=sys.stderr)
        per_dataset[ds] = run_dataset(ds, ckpt, args.output_dir, args)

    results_md = os.path.join(args.output_dir, "RESULTS.md")
    write_results_md(results_md, args.models_dir, per_dataset)
    print(json.dumps({ds: res["metrics"] for ds, res in per_dataset.items()}))
    return per_dataset


if __name__ == "__main__":
    main()
