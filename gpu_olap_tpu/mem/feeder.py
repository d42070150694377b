"""Double-buffered host->device feeder — the transfer-queue analogue.

The reference overlaps transfers with compute via 8 CUDA streams, async
memcpy, and semaphore flow control (``transfer_queue.rs:36-139``).  JAX's
dispatch is already asynchronous: ``jax.device_put`` returns immediately and
computations enqueue behind it.  What the feeder adds is the reference's
*flow control* and *overlap discipline*: a bounded window of in-flight chunk
transfers (semaphore analogue, ``transfer_queue.rs:49``) kept ``num_buffers``
ahead of compute, with bucket-shaped staging so chunk shapes never recompile.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import numpy as np

from ..utils.jaxenv import ensure_jax
from ..utils.metrics import GLOBAL_METRICS
from ..utils.tracing import get_logger

jax = ensure_jax()

logger = get_logger(__name__)


class DeviceFeeder:
    """Stream host chunks to the device ``num_buffers`` ahead of consumption.

    Usage::

        feeder = DeviceFeeder(num_buffers=2)
        for dev_chunk in feeder.feed(host_chunk_iter, put=my_device_put):
            consume(dev_chunk)   # transfer of chunk i+1..i+k already in flight
    """

    def __init__(self, num_buffers: int = 2, device=None):
        if num_buffers < 1:
            raise ValueError("num_buffers must be >= 1")
        self.num_buffers = num_buffers
        self.device = device

    def _put(self, host_chunk):
        if self.device is not None:
            return jax.device_put(host_chunk, self.device)
        return jax.device_put(host_chunk)

    def feed(self, chunks: Iterable, put: Optional[Callable] = None) -> Iterator:
        """Yield device-resident chunks with a bounded in-flight window."""
        put = put or self._put
        window = collections.deque()
        it = iter(chunks)
        try:
            for _ in range(self.num_buffers):
                window.append(put(next(it)))
        except StopIteration:
            pass
        while window:
            try:
                window.append(put(next(it)))  # start next transfer (async)
            except StopIteration:
                pass
            yield window.popleft()


def pad_chunk(arr: np.ndarray, bucket_rows: int) -> np.ndarray:
    """Pad a host chunk to the bucket shape (recompile avoidance)."""
    if arr.shape[0] == bucket_rows:
        return arr
    out = np.zeros((bucket_rows,) + arr.shape[1:], dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def stream_reduce(chunks: Iterable, step: Callable, init, num_buffers: int = 2,
                  device=None):
    """Out-of-core streamed reduction: ``state = step(state, chunk)`` with
    transfers overlapped against the jitted ``step`` — the unified-memory /
    oversubscription replacement (README.md:338-352 streaming contract).

    ``chunks`` yields host pytrees; ``step`` must be jitted with donated state
    for in-place accumulation."""
    feeder = DeviceFeeder(num_buffers=num_buffers, device=device)
    state = init
    nbytes = 0
    for dev_chunk in feeder.feed(chunks):
        state = step(state, dev_chunk)
        for leaf in jax.tree_util.tree_leaves(dev_chunk):
            nbytes += leaf.nbytes
    GLOBAL_METRICS.bump("h2d_bytes", nbytes)
    return state
