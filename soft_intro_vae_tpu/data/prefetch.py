"""Input-pipeline overlap: background batch preparation + device prefetch.

The reference overlaps input with compute via DataLoader worker processes
and DareBlopy reader threads (SURVEY §3.1/§3.3). Here a small thread pushes
host batches to the device ahead of the training step, so H2D transfer and
augmentation overlap the (async-dispatched) XLA execution.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def device_prefetch(batches: Iterable, size: int = 2,
                    put_fn: Optional[Callable] = None) -> Iterator:
    """Wrap a host-batch iterable: a worker thread applies ``put_fn`` (e.g.
    mesh sharding / jnp.asarray) and keeps ``size`` device batches in flight.
    """
    put_fn = put_fn or jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for b in batches:
                q.put(put_fn(b))
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
