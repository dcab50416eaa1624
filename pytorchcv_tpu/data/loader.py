"""Host->device prefetch: overlap input staging with device compute.

The torch DataLoader's worker/pinned-memory machinery maps, on TPU, to a
single staging thread that issues ``jax.device_put`` for batch k+1..k+size
while the jitted step consumes batch k — device transfers are async, so the
thread only pays the host-side cost (numpy conversion, sharding layout) off
the critical path.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["PrefetchLoader", "prefetch_to_mesh"]

_END = object()


class PrefetchLoader:
    """Iterate ``it`` with ``size`` batches staged ahead onto devices.

    ``stage`` maps one raw batch (any pytree of arrays) to its on-device
    form; default is ``device_put`` sharded over ``mesh``'s ``data`` axis
    (batch-dim data parallelism) or an unsharded put without a mesh.
    Exceptions from the source iterator propagate to the consumer.
    """

    def __init__(self, it: Iterable[Any], mesh: Optional[Mesh] = None,
                 size: int = 2,
                 stage: Optional[Callable[[Any], Any]] = None):
        if stage is None:
            if mesh is not None:
                shard = NamedSharding(mesh, P("data"))
                stage = lambda batch: jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, shard), batch)
            else:
                stage = jax.device_put
        self._it = it
        self._stage = stage
        self._size = max(1, int(size))

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self._size)

        def producer():
            try:
                for batch in self._it:
                    q.put(self._stage(batch))
            except BaseException as e:  # surface in the consumer
                q.put((_END, e))
                return
            q.put((_END, None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item


def prefetch_to_mesh(it: Iterable[Any], mesh: Mesh,
                     size: int = 2) -> Iterator[Any]:
    """Generator form: yields batches device_put-sharded over ``data``."""
    return iter(PrefetchLoader(it, mesh=mesh, size=size))
