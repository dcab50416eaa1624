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
                repl = NamedSharding(mesh, P())
                n = mesh.shape["data"]

                def _put(x):
                    # Batch-dim sharding only where it is legal: scalar
                    # leaves (0-d metadata) and leaves whose dim 0 isn't
                    # divisible by the data axis replicate instead of
                    # erroring mid-thread (mirrors shard_batch).
                    ok = getattr(x, "ndim", 0) >= 1 and \
                        x.shape[0] % n == 0
                    return jax.device_put(x, shard if ok else repl)

                stage = lambda batch: jax.tree_util.tree_map(_put, batch)
            else:
                stage = jax.device_put
        self._it = it
        self._stage = stage
        self._size = max(1, int(size))

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self._size)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._it:
                    if not _put(self._stage(batch)):
                        return          # consumer abandoned iteration
            except BaseException as e:  # surface in the consumer
                _put((_END, e))
                return
            _put((_END, None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is _END:
                    if item[1] is not None:
                        raise item[1]
                    return
                yield item
        finally:
            # Consumer may break early (or zip with a shorter stream):
            # release the producer and drop staged device buffers instead
            # of holding `size` batches of HBM per abandoned loader.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)


def prefetch_to_mesh(it: Iterable[Any], mesh: Mesh,
                     size: int = 2) -> Iterator[Any]:
    """Generator form: yields batches device_put-sharded over ``data``."""
    return iter(PrefetchLoader(it, mesh=mesh, size=size))
