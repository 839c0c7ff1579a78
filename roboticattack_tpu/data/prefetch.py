"""Host->device double buffering: overlap batch assembly + transfer with TPU
compute. The reference blocks on `next(dataloader)` each outer iteration; here
a daemon thread keeps `depth` batches already resident on device."""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


def device_prefetch(batches: Iterator, depth: int = 2, sharding=None) -> Iterator:
    """Wrap a host batch iterator; yields device-resident batches."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def worker():
        try:
            for batch in batches:
                q.put(put(batch))
        except Exception as e:  # surface producer errors at the consumer
            q.put(e)
        q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, Exception):
            raise item
        yield item
