"""Host->device prefetching.

The reference's input path is fully synchronous: fread + memcpy + cudaMemcpy
on the training thread every step (load_new_batch, resnet.cu:1235-1325), a
known bottleneck its own comment concedes (resnet.cu:1233). Here a
background thread stages the next ``depth`` batches onto the device while
the current step computes — the double-buffered pipeline SURVEY.md section 7
calls for. With a mesh, batches land pre-sharded across the data axis so
the transfer rides all hosts' PCIe links in parallel.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class DevicePrefetcher:
    def __init__(self, source: Iterator, *, depth: int = 2, sharding=None,
                 transfer_dtype=None):
        self.source = source
        self.depth = depth
        self.sharding = sharding
        # cast images host-side before the transfer (bf16 halves the
        # host->device traffic; the model casts to compute dtype anyway)
        self.transfer_dtype = transfer_dtype
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, batch):
        # the per-batch shard cursor is host bookkeeping, not device data
        cursor = None
        if isinstance(batch, dict) and "cursor" in batch:
            batch = dict(batch)
            cursor = batch.pop("cursor")
        if self.transfer_dtype is not None and "images" in batch:
            import jax.numpy as jnp
            import numpy as np

            batch = dict(batch)
            batch["images"] = np.asarray(batch["images"]).astype(
                jnp.dtype(self.transfer_dtype)
            )
        if self.sharding is not None:
            # dict shardings are per-key (spatial batches: images carry an
            # extra spec axis labels can't); unknown keys go to the default
            # device (device_put(v, None) == device_put(v))
            out = {
                k: self._place(
                    v,
                    self.sharding.get(k)
                    if isinstance(self.sharding, dict)
                    else self.sharding,
                )
                for k, v in batch.items()
            }
        else:
            out = jax.tree.map(jax.device_put, batch)
        if cursor is not None:
            out["cursor"] = cursor
        return out

    @staticmethod
    def _place(v, sharding):
        """device_put, or — when the sharding spans processes (multi-host
        mesh) — assemble the GLOBAL batch from this host's local slice.
        Each host feeds batch rows [i*per, (i+1)*per) of the global batch
        (the host_batch_slice loader contract); the batch dim is the only
        dim that differs between the local slice and the global array, so
        the global shape is local with dim 0 scaled by process count."""
        if sharding is None or sharding.is_fully_addressable:
            return jax.device_put(v, sharding)
        import numpy as np

        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        return jax.make_array_from_process_local_data(sharding, v, global_shape)

    def _worker(self):
        try:
            for batch in self.source:
                if self._stop:
                    return
                self._q.put(self._put(batch))
                if self._stop:
                    return
        except BaseException as e:  # surfaced on the consumer thread
            self._err = e
        finally:
            if not self._stop:
                self._q.put(self._done)

    def stop(self):
        """Shut the worker down cleanly. A daemon thread mid-device_put at
        interpreter exit aborts the process (pthread 'exception not
        rethrown'), so the owner must stop the pipeline before exiting."""
        self._stop = True
        while self._thread.is_alive():
            try:
                self._q.get_nowait()  # unblock a worker stuck in put()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.2)

    def qsize(self) -> int:
        """Current device-ready queue depth (bench observability: a full
        queue means the loader outruns the step; 0 means input-bound)."""
        return self._q.qsize()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(source, *, depth: int = 2, mesh=None,
                       data_axis: str = "data", transfer_dtype=None,
                       batch_shardings=None):
    """Wrap a host batch iterator in a device prefetcher; with a mesh the
    batch is sharded along the data axis. batch_shardings (a per-key
    sharding dict, e.g. images P('data','spatial')) overrides the
    uniform data-axis placement."""
    sharding = batch_shardings
    if sharding is None and mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(data_axis))
    return DevicePrefetcher(
        source, depth=depth, sharding=sharding, transfer_dtype=transfer_dtype
    )
