"""Host->device double buffering: overlap batch assembly + transfer with TPU
compute. The reference blocks on `next(dataloader)` each outer iteration; here
a daemon thread keeps `depth` batches already resident on device."""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


def host_prefetch(batches: Iterator, depth: int = 2) -> Iterator:
    """Overlap HOST batch assembly (tf.data iteration, tokenize, pad) with
    device compute, keeping every jax call on the consumer thread.

    Rationale: `device_prefetch` below deadlocks through the axon remote-TPU
    relay (concurrent device_put from the daemon thread vs the main thread's
    execution RPCs — measured round 2, attacks/attacker.py NOTE). The ~0.1 s
    of per-outer-step host work is the real cost, and assembling it is pure
    numpy/tf — so this wrapper runs ONLY that on a daemon thread and hands
    finished numpy batches over a bounded queue; the main thread still does
    its own (cheap, ~1 MB) host->device transfer. Works even on a 1-core
    host: the main thread sleeps in the device-execution RPC (GIL released)
    while the feeder assembles the next batch."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for batch in batches:
                q.put(batch)
        except Exception as e:  # surface producer errors at the consumer
            q.put(e)
        q.put(sentinel)

    threading.Thread(target=worker, daemon=True, name="host-prefetch").start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, Exception):
            raise item
        yield item


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
