"""Background-prefetching host loader.

The reference used torch DataLoader worker processes (num_workers=4,
reference train.py:950).  Here host work is only PNG decode + batch
assembly (augmentation is on device), so a single prefetch thread with a
bounded queue suffices: it hides decode latency behind device compute and
optionally pre-places batches on device with the training sharding so the
H2D copy also overlaps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


class PrefetchLoader:
    """Wrap a batch iterator with an N-deep background prefetch queue.

    ``place`` (optional): callable applied to each (images, labels) pair
    in the PRODUCER thread, before the pair enters the queue — device
    placement (the H2D copy) thereby overlaps the consumer's compute.
    Exceptions in the producer propagate to the consumer.
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2, place=None):
        self._it = iterator
        self._place = place
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _worker(self):
        try:
            for item in self._it:
                if self._place is not None:
                    item = self._place(*item)
                self._q.put(item)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def device_prefetch_iterator(
    batch_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
    mesh=None,
    depth: int = 2,
):
    """Prefetch batches and device_put them with the training sharding."""
    place = None
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        def place(images, labels):  # runs in the prefetch thread
            return shard_batch(mesh, images, labels.astype(np.int32))

    return iter(PrefetchLoader(batch_iter, depth=depth, place=place))
