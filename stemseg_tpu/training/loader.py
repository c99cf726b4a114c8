"""Background-prefetching batch loader.

TPU-native replacement for the reference's
``torch.utils.data.DataLoader(num_workers=8)`` (``training/utils.py:235-252``):
a thread pool builds collated batches ahead of the device (cv2 / numpy
release the GIL for the heavy work) and a semaphore bounds the number of
batches in flight. Shape bucketing keeps the number of distinct jit
signatures small (``collate.py``).
"""

from __future__ import annotations

import threading
from typing import Iterator, List, Optional, Tuple

from stemseg_tpu.data.collate import collate_fn


class PrefetchLoader:
    """Iterates batches of samples built by worker threads, in sampler order.

    :param dataset: indexable dataset
    :param batch_sampler: iterable of index lists (e.g.
        ``IterationBasedBatchSampler``)
    :param max_instances: instance-axis pad size for collate
    :param min_dims: optional (H, W) bucket floor
    :param num_workers: prefetch threads
    :param prefetch_depth: max batches in flight
    """

    def __init__(self, dataset, batch_sampler, max_instances: int = 8,
                 min_dims: Optional[Tuple[int, int]] = None,
                 num_workers: int = 4, prefetch_depth: int = 4,
                 overflow: str = "ignore"):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.max_instances = max_instances
        self.min_dims = min_dims
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.overflow = overflow

    def _build_batch(self, indices: List[int]):
        samples = [self.dataset[i] for i in indices]
        return collate_fn(samples, self.max_instances, self.min_dims,
                          overflow=self.overflow)

    def __iter__(self) -> Iterator[dict]:
        idx_iter = iter(self.batch_sampler)
        pull_lock = threading.Lock()
        seq_counter = [0]
        in_flight = threading.BoundedSemaphore(self.prefetch_depth)
        results: dict = {}
        results_cv = threading.Condition()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                if not in_flight.acquire(timeout=0.1):
                    continue  # re-check stop flag
                with pull_lock:
                    try:
                        indices = next(idx_iter)
                    except StopIteration:
                        in_flight.release()
                        return
                    seq = seq_counter[0]
                    seq_counter[0] += 1
                try:
                    batch = self._build_batch(indices)
                except Exception as exc:  # surface worker errors to consumer
                    batch = exc
                with results_cv:
                    results[seq] = batch
                    results_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        next_seq = 0
        try:
            while True:
                with results_cv:
                    while next_seq not in results:
                        if not any(t.is_alive() for t in threads):
                            if next_seq in results:
                                break
                            return
                        results_cv.wait(timeout=0.1)
                    batch = results.pop(next_seq)
                in_flight.release()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
                next_seq += 1
        finally:
            stop.set()
            # join so no worker is killed mid-build (a daemon thread torn
            # down inside native code aborts the process at interpreter exit)
            for t in threads:
                t.join(timeout=30.0)


def device_prefetch(iterator, place):
    """One-deep device prefetch (the ``prefetch_to_device`` pattern).

    ``place`` dispatches a host batch's H2D transfer and returns device
    arrays; JAX transfers are asynchronous, so placing batch ``n+1``
    immediately after yielding batch ``n`` overlaps its H2D with step
    ``n``'s on-device compute instead of serializing transfer → step.
    The reference's DataLoader has no analogue (CUDA implicitly overlaps
    via ``pin_memory``/streams); on TPU this explicit stagger is the
    idiomatic equivalent.
    """
    prev = None
    for host_batch in iterator:
        cur = place(host_batch)
        if prev is not None:
            yield prev
        prev = cur
    if prev is not None:
        yield prev
