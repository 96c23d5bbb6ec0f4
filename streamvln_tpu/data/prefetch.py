"""Background batch prefetch: overlap host-side data work with device
compute.

The reference overlaps JPEG decode/collation with the train step via 8
DataLoader worker processes per rank (HF Trainer dataloader config;
reference: llava/train/llava_trainer.py:304-356). The TPU loop is a
single process driving one chip, so the equivalent is a worker THREAD:
sample loading runs through the C++ decoder (native/dataloader.cpp) and
PIL, both of which release the GIL for the heavy work, and the
device_put happens in the worker too so the host->device upload also
rides ahead of the step. A bounded queue (depth batches) provides
backpressure so host memory stays flat.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Optional


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


class BatchPrefetcher:
    """Iterates `index_batches` (re-iterated forever) in a background
    thread, mapping each index list through `make_batch` (load +
    collate + optional device placement), keeping up to `depth`
    prepared batches ahead of the consumer.

    depth=0 degrades to fully synchronous (no thread) — useful for
    debugging and as the measurement baseline.
    """

    def __init__(self, index_batches: Iterable,
                 make_batch: Callable[[list], dict],
                 depth: int = 2):
        self.index_batches = index_batches
        self.make_batch = make_batch
        self.depth = depth
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        if depth > 0:
            self._q: queue.Queue = queue.Queue(maxsize=depth)
            self._thread = threading.Thread(target=self._worker,
                                            daemon=True)
            self._thread.start()
        else:
            self._iter = self._indices()

    def _indices(self):
        while True:
            got_any = False
            for idx in self.index_batches:
                got_any = True
                yield idx
            if not got_any:
                raise RuntimeError("empty index_batches")

    def _worker(self):
        try:
            for idx in self._indices():
                if self._stop.is_set():
                    return
                batch = self.make_batch(idx)
                while True:
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            return
        except BaseException as e:  # noqa: BLE001 — re-raised in get()
            self._q.put(_Failure(e))

    def get(self) -> dict:
        """Next prepared batch; re-raises worker exceptions."""
        if self._thread is None:
            return self.make_batch(next(self._iter))
        item = self._q.get()
        if isinstance(item, _Failure):
            raise item.exc
        return item

    def close(self):
        self._stop.set()
        if self._thread is not None:
            # drain so a blocked put() sees the stop flag
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
