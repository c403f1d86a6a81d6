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
