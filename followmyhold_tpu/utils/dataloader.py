"""Prefetching host data loader.

The reference loads and decodes each image synchronously inside every stage
loop (e.g. geometry/moge.py per-image PIL+cv2 work between model calls). Here
a small thread pool decodes ahead while the device computes, so host IO
overlaps TPU time. Pure stdlib; order-preserving.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Sequence, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def prefetch_map(
    fn: Callable[[T], U],
    items: Sequence[T],
    num_workers: int = 2,
    prefetch: int = 4,
) -> Iterator[U]:
    """Yield fn(item) in order, computed ahead by worker threads.

    Exceptions propagate at the yield point of the failing item, preserving
    the per-item skip-and-continue pattern of the stage drivers.
    """
    items = list(items)
    if not items:
        return
    results: dict[int, object] = {}
    cond = threading.Condition()
    next_in = {"i": 0}
    next_out = {"i": 0}
    window = prefetch + max(1, num_workers)

    def worker():
        while True:
            with cond:
                # window-based backpressure on TAKING work (not on storing
                # results): storing must never block, or the worker holding
                # the item the consumer waits for can deadlock behind
                # out-of-order completions filling the buffer.
                while True:
                    i = next_in["i"]
                    if i >= len(items):
                        return
                    if i < next_out["i"] + window:
                        next_in["i"] = i + 1
                        break
                    cond.wait(timeout=0.5)
            try:
                out = (False, fn(items[i]))
            except Exception as e:  # noqa: BLE001
                out = (True, e)
            with cond:
                results[i] = out
                cond.notify_all()

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(max(1, num_workers))]
    for t in threads:
        t.start()

    for i in range(len(items)):
        with cond:
            while i not in results:
                cond.wait(timeout=0.5)
            is_err, val = results.pop(i)
            next_out["i"] = i + 1
            cond.notify_all()
        if is_err:
            raise val
        yield val
