"""Device prefetch: overlap host batch prep + H2D transfer with compute.

The reference pipeline is fully serial (``num_workers=0``, per-tensor
``.to(DEVICE)`` — SURVEY.md §3.1 hot-loop notes).  Here the pipeline thread
already overlaps decode with compute; this iterator additionally keeps
``depth`` batches resident on device (or sharded over a mesh) so the train
step never waits on the H2D copy.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(
    batches: Iterable,
    depth: int = 2,
    mesh=None,
) -> Iterator:
    """Yield device-resident batches, keeping ``depth`` in flight."""
    from odc_tpu.parallel.mesh import shard_batch

    def put(b):
        if mesh is not None:
            return shard_batch(b, mesh)
        return jax.tree.map(jax.device_put, b)

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass

    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def threaded_prefetch(make_items, maxsize: int = 2) -> Iterator:
    """Run ``make_items()`` (an iterable factory) on a daemon thread,
    yielding its items through a bounded queue.

    Shutdown-safe: if the CONSUMER stops early (exception or break), the
    worker is signalled via a stop event and unblocked from its ``put`` —
    no leaked thread pinning ``maxsize`` buffers.  Worker exceptions
    re-raise in the consumer (unless the consumer is already unwinding its
    own exception)."""
    import queue as queue_mod
    import sys
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=maxsize)
    stop = threading.Event()
    sentinel = object()
    errbox = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in make_items():
                if not _put(item):
                    return
        except BaseException as e:  # surfaced in the consumer thread
            errbox.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
    finally:
        stop.set()
        t.join(timeout=10.0)
        # re-raise a worker error only when the consumer isn't already
        # propagating its own exception (incl. GeneratorExit from an early
        # close) — but never silently drop it: a real loader failure must
        # leave a trace even when the consumer is unwinding.
        if errbox:
            if sys.exc_info()[0] is None:
                raise errbox[0]
            import warnings

            warnings.warn(
                "threaded_prefetch: suppressed worker exception while the "
                f"consumer was unwinding: {errbox[0]!r}",
                RuntimeWarning,
            )
