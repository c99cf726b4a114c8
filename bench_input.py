"""Input-pipeline benchmark (VERDICT r1 item 6).

Measures the training data pipeline's sustained sample-build rate with FULL
augmentation — COCO image -> 8-frame clip synthesis (perspective/affine/
photometric warps, ``data/augmenter.py``) at davis_1 production dims
(min 736 / max 1248) plus collation — and compares it against the measured
278 ms/iter davis_1 train step (BASELINE.md).

Because loader workers are plain threads (``training/loader.py``), their
multi-core scaling is bounded by the fraction of build time that HOLDS the
GIL (cv2 warps, numpy resizes and the ctypes RLE codec all release it).
This bench measures that fraction directly with a probe thread AND measures
the actual sustained rate with 1 / 2 / 4 concurrent workers (the scaling
curve). On a single-core host the workers oversubscribe the core, so the
curve bounds the contention cost rather than showing speedup. Measured on
the idle 1-core dev box (BASELINE.md): 3.12 / 3.21 / 2.88 samples/s at
1 / 2 / 4 workers — 1-2 workers BEAT the 2.4-2.8 serial rate (prefetch
overlaps collate in the consumer thread), and 4x oversubscription costs
only ~10%; the GIL-held fraction rises 0.05 -> 0.22 with worker count
(handoff overhead, serial probe 0.04-0.06). Practical sizing on an N-core
host: num_workers <= N avoids oversubscription entirely, and the serial
GIL-held fraction bounds thread scaling at ~1/0.05 = 20 workers before GIL
serialization bites; both bounds comfortably cover the reference's
8-worker default (``training/utils.py:235-252``).

Prints ONE JSON line. Run ``python bench_input.py`` on any host (synthetic
JPEG dataset, no real data needed).
"""

import json
import os
import tempfile
import threading
import time

import numpy as np


def build_synthetic_coco(tmp, n_images=24, h=480, w=640, n_inst=3):
    import cv2

    from stemseg_tpu.utils import rle as rle_codec

    rng = np.random.RandomState(0)
    base_dir = os.path.join(tmp, "imgs")
    os.makedirs(base_dir, exist_ok=True)
    images = []
    for i in range(n_images):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        rel = f"{i:06d}.jpg"
        cv2.imwrite(os.path.join(base_dir, rel), img)
        segs, cats = [], []
        for j in range(n_inst):
            m = np.zeros((h, w), np.uint8)
            y0 = rng.randint(0, h - 80)
            x0 = rng.randint(0, w - 120)
            m[y0:y0 + 80, x0:x0 + 120] = 1
            segs.append(rle_codec.encode(m)["counts"].decode("utf-8"))
            cats.append(1)
        images.append({"image_path": rel, "height": h, "width": w,
                       "categories": cats, "segmentations": segs})
    ds = {"meta": {"category_labels": {"1": "person"}}, "images": images}
    json_path = os.path.join(tmp, "images.json")
    with open(json_path, "w") as fh:
        json.dump(ds, fh)
    return base_dir, json_path


class GilProbe(threading.Thread):
    """Estimates the fraction of wall time the GIL is held by other threads:
    a 1 ms sleep should wake in ~1 ms; extra delay means the probe could not
    be scheduled because another thread held the GIL."""

    def __init__(self, interval=0.001):
        super().__init__(daemon=True)
        self.interval = interval
        self.blocked = 0.0
        self.total = 0.0
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            t0 = time.perf_counter()
            time.sleep(self.interval)
            dt = time.perf_counter() - t0
            self.total += dt
            self.blocked += max(0.0, dt - self.interval * 1.5)

    def stop(self):
        self._halt.set()
        self.join()
        return self.blocked / max(self.total, 1e-9)


def main():
    from stemseg_tpu.config import load_preset
    from stemseg_tpu.data import CocoDataLoader
    from stemseg_tpu.training.loader import PrefetchLoader

    cfg = load_preset("davis_1")
    step_time_s = 0.278  # measured davis_1 train-step time (BASELINE.md)

    with tempfile.TemporaryDirectory() as tmp:
        base_dir, json_path = build_synthetic_coco(tmp)
        ds = CocoDataLoader(base_dir, json_path, cfg.input,
                            category_agnostic=True)

        # serial build rate (sample build incl. collate, no loader machinery)
        from stemseg_tpu.data.collate import collate_fn

        ds[0]  # warm caches
        probe = GilProbe()
        probe.start()
        n_serial = 16
        t0 = time.perf_counter()
        for i in range(n_serial):
            collate_fn([ds[i % len(ds)]], 16)
        serial_dt = (time.perf_counter() - t0) / n_serial
        gil_frac = probe.stop()

        # MEASURED concurrency scaling curve (VERDICT r2 item 7): sustained
        # loader rate + GIL-held fraction with 1 / 2 / 4 worker threads all
        # doing full augmentation concurrently. On a 1-core host the curve
        # measures CONTENTION, not speedup: if builds release the GIL as
        # claimed, aggregate throughput holds ~serial rate and the GIL-held
        # fraction stays far below the serialization threshold; lock or
        # GIL contention would show as a falling aggregate rate.
        def measure_loader(num_workers, n_batches=24):
            sampler = [[i % len(ds)] for i in range(n_batches + 6)]
            loader = PrefetchLoader(ds, sampler, max_instances=16,
                                    num_workers=num_workers,
                                    prefetch_depth=4)
            it = iter(loader)
            next(it)  # warm
            p = GilProbe()
            p.start()
            t0 = time.perf_counter()
            got = 0
            for batch in it:
                got += batch["images"].shape[0]
                if got >= n_batches:
                    break
            rate = got / (time.perf_counter() - t0)
            frac = p.stop()
            it.close()  # stop the workers before the tempdir vanishes
            return rate, frac

        curve = {}
        for nw in (1, 2, 4):
            rate, frac = measure_loader(nw)
            curve[nw] = {"rate": round(rate, 3),
                         "gil_held_fraction": round(frac, 3)}
        # headline = best sustained rate on THIS host (worker counts beyond
        # the core count only add oversubscription cost — see docstring)
        loader_rate = max(v["rate"] for v in curve.values())

    serial_rate = 1.0 / serial_dt
    n_cores = os.cpu_count() or 1
    consumption = 1.0 / step_time_s  # samples/s per chip at batch 1

    print(json.dumps({
        "metric": "input_pipeline_samples_per_sec",
        "value": round(loader_rate, 3),
        "unit": "samples/s",
        "serial_build_ms": round(serial_dt * 1e3, 1),
        "serial_rate": round(serial_rate, 3),
        "gil_held_fraction_serial": round(gil_frac, 3),
        "n_cores_this_host": n_cores,
        "scaling_curve": {f"{nw}_workers": v for nw, v in curve.items()},
        "train_step_consumption_per_chip": round(consumption, 2),
        "headroom_this_host": round(loader_rate / consumption, 2),
    }))


if __name__ == "__main__":
    main()
