"""Double-buffered host -> device prefetch pipeline.

TPU-native replacement for the reference's ``tf.data`` prefetch overlap
(``calculators/trajectory_calculator.py:357-406``,
``transformations/transformations.py:491,595``): a background thread pool
reads the next chunk(s) from the HDF5 store and issues ``jax.device_put``
while the device is busy with the current chunk, so HBM transfers and
disk I/O hide behind compute. Depth 2 = classic double buffering.
"""

from __future__ import annotations

import collections
import concurrent.futures
import logging
from typing import Callable, Iterable, Iterator, Sequence, TypeVar

import jax

log = logging.getLogger(__name__)

T = TypeVar("T")


def prefetch_to_device(
    load_fn: Callable[[T], object],
    items: Sequence[T],
    depth: int = 2,
    device=None,
) -> Iterator[object]:
    """Yield ``device_put(load_fn(item))`` with ``depth``-deep lookahead.

    ``load_fn`` runs in a worker thread (it may do disk I/O and NumPy work);
    the returned pytree is transferred to ``device`` asynchronously.
    JAX dispatch is thread-safe; transfers overlap with the caller's
    device computation.
    """
    items = list(items)
    if not items:
        return
    if device is None and len(jax.devices()) == 1:
        # single device: commit eagerly so the transfer overlaps compute
        device = jax.devices()[0]

    def load_and_put(item):
        host = load_fn(item)
        if device is None:
            # multi-device meshes choose their own sharding downstream
            # (a committed single-device array would conflict with
            # shard_map); the background thread still hides the disk I/O.
            return host
        return jax.tree.map(lambda x: jax.device_put(x, device), host)

    with concurrent.futures.ThreadPoolExecutor(max_workers=depth) as pool:
        queue = collections.deque()
        it = iter(items)
        for _ in range(depth):
            try:
                queue.append(pool.submit(load_and_put, next(it)))
            except StopIteration:
                break
        while queue:
            fut = queue.popleft()
            try:
                queue.append(pool.submit(load_and_put, next(it)))
            except StopIteration:
                pass
            yield fut.result()


class PrefetchingLoader:
    """Reusable wrapper: iterate device-resident chunks of a store property.

    The iteration plan (frame slabs) comes from the static
    :class:`~lammps_analysis_tpu.memory.planner.BatchPlan`; this class only
    owns the I/O overlap.
    """

    def __init__(self, store, depth: int = 2, device=None):
        self.store = store
        self.depth = depth
        self.device = device

    def iter_slabs(
        self,
        paths: Sequence[str],
        slabs: Iterable[tuple],
        dtype=None,
    ) -> Iterator[dict]:
        """Yield ``{path: device array}`` for each ``(start, stop)`` slab."""

        def load(slab):
            start, stop = slab
            kwargs = {"dtype": dtype} if dtype is not None else {}
            return self.store.load(paths, frames=slice(start, stop), **kwargs)

        return prefetch_to_device(load, list(slabs), self.depth, self.device)


def iter_in_background(iterable, depth: int = 2):
    """Run a (host-side) iterator in a worker thread with bounded lookahead.

    Parse/write overlap for ingestion (VERDICT r2 item 7): the file
    reader's parse of chunk k+1 proceeds while the caller writes chunk k
    to the HDF5 store. ``depth`` bounds the number of parsed-but-unwritten
    chunks held in memory. Exceptions from the producer re-raise at the
    consumer's next pull; abandoning the iterator (``close``/GC) stops
    the producer promptly.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(int(depth), 1))
    _END = object()
    stop = threading.Event()

    def _put_until_stopped(item) -> bool:
        """Bounded put that gives up once the consumer signals stop —
        an abandoned consumer must not leave this thread blocked forever
        holding ``depth`` parsed chunks."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def produce():
        try:
            for item in iterable:
                if not _put_until_stopped(item):
                    return
            _put_until_stopped(_END)
        except BaseException as err:  # propagate to the consumer
            _put_until_stopped(err)

    worker = threading.Thread(target=produce, daemon=True, name="ingest-parse")
    worker.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
