"""Input-pipeline overlap: parallel host decode + device prefetch.

The reference's input path is a torch DataLoader with NO workers running the
whole collate (including the 2B-model forward!) on the main process
(`train_addvisor.py:400-409,247-260`) — the accelerator idles during every
load. The TPU-native shape: decode on host threads (the C++ decoder and
scipy IO release the GIL), stage the next batches onto the device with
`jax.device_put` from a background thread, and keep the jitted step's queue
non-empty so HBM never waits on the host.

    batches = AudioBatcher(...)
    for dev_batch in prefetch_to_device(batches, size=2, sharding=data_sharding):
        state, aux = train_step(state, frozen, dev_batch)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterable, Iterator


class _End:
    pass


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Run `iterable` in a background thread, buffering up to `size` items.
    Exceptions re-raise at the consumer; the thread is a daemon, so an
    abandoned iterator never blocks interpreter exit."""
    q: "queue.Queue[Any]" = queue.Queue(maxsize=max(1, size))

    def fill():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            q.put(_Raised(e))
        else:
            q.put(_End)

    threading.Thread(target=fill, daemon=True).start()
    while True:
        item = q.get()
        if item is _End:
            return
        if isinstance(item, _Raised):
            raise item.exc
        yield item


def prefetch_to_device(
    iterable: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Prefetch + `jax.device_put` each batch (optionally with a
    NamedSharding so multi-chip batches land already data-sharded). The
    transfer is issued from the background thread, overlapping the previous
    step's device compute."""
    import jax

    def staged():
        for item in iterable:
            yield (
                jax.device_put(item, sharding)
                if sharding is not None
                else jax.device_put(item)
            )

    return prefetch(staged(), size=size)


def parallel_map(fn, items, num_workers: int = 8) -> list:
    """Order-preserving threaded map for host-side decode (wav IO releases
    the GIL in both the ctypes C++ fast path and scipy)."""
    if num_workers <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        return list(pool.map(fn, items))
