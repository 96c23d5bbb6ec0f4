"""Background batch prefetch: ordering, backpressure, error
propagation, clean shutdown (reference overlap mechanism: DataLoader
workers, llava/train/llava_trainer.py:304-356)."""
import threading
import time

import pytest

from streamvln_tpu.data.prefetch import BatchPrefetcher


class Sampler:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_prefetch_preserves_order_and_cycles():
    sampler = Sampler([[0, 1], [2, 3], [4, 5]])
    with BatchPrefetcher(sampler, lambda idx: {"idx": list(idx)},
                         depth=2) as pf:
        got = [pf.get()["idx"] for _ in range(7)]
    assert got == [[0, 1], [2, 3], [4, 5],
                   [0, 1], [2, 3], [4, 5], [0, 1]]


def test_prefetch_matches_synchronous():
    sampler = Sampler([[i] for i in range(5)])
    sync = BatchPrefetcher(sampler, lambda idx: {"v": idx[0] * 10},
                           depth=0)
    with BatchPrefetcher(sampler, lambda idx: {"v": idx[0] * 10},
                         depth=3) as pf:
        for _ in range(11):
            assert pf.get() == sync.get()


def test_prefetch_runs_ahead():
    """With depth 2 the worker prepares batches while the consumer
    sleeps: the loaded count outruns the consumed count."""
    loaded = []
    lock = threading.Lock()

    def make(idx):
        with lock:
            loaded.append(idx[0])
        return {"v": idx[0]}

    sampler = Sampler([[i] for i in range(10)])
    with BatchPrefetcher(sampler, make, depth=2) as pf:
        pf.get()
        deadline = time.time() + 5
        while len(loaded) < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert len(loaded) >= 3   # consumed 1, >=2 more staged


def test_prefetch_propagates_worker_error():
    def make(idx):
        if idx[0] == 2:
            raise ValueError("boom on 2")
        return {"v": idx[0]}

    sampler = Sampler([[0], [1], [2], [3]])
    with BatchPrefetcher(sampler, make, depth=2) as pf:
        assert pf.get()["v"] == 0
        assert pf.get()["v"] == 1
        with pytest.raises(ValueError, match="boom on 2"):
            pf.get()


def test_prefetch_close_joins_thread():
    ev = threading.Event()

    def make(idx):
        ev.set()
        return {"v": idx[0]}

    pf = BatchPrefetcher(Sampler([[0]]), make, depth=1)
    ev.wait(5)
    pf.close()
    assert not pf._thread.is_alive()


def test_empty_sampler_raises():
    with BatchPrefetcher(Sampler([]), lambda i: {}, depth=1) as pf:
        with pytest.raises(RuntimeError, match="empty"):
            pf.get()
