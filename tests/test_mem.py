"""Buffer arena + device feeder tests (slab allocator / transfer queue
analogues, ``slab_allocator.rs`` / ``transfer_queue.rs`` roles)."""

import numpy as np
import pytest

from gpu_olap_tpu.mem.arena import BufferArena, size_class
from gpu_olap_tpu.mem.feeder import DeviceFeeder, pad_chunk, stream_reduce


def test_size_class_selection():
    # smallest class >= size (slab_allocator.rs:95-107 semantics)
    assert size_class(1) == 1024
    assert size_class(1024) == 1024
    assert size_class(1025) == 2048
    assert size_class(3000) == 4096


def test_arena_reuse():
    arena = BufferArena(max_bytes=1 << 20)
    a = arena.acquire(1000, np.int64)
    assert a.shape[0] == 1024
    arena.release(a)
    b = arena.acquire(900, np.int64)
    assert b is a  # pooled buffer reused (O(1) pop)
    stats = arena.stats()
    assert stats["allocated_bytes"] == 1024 * 8


def test_arena_limit():
    arena = BufferArena(max_bytes=1024 * 8)
    arena.acquire(1024, np.int64)
    with pytest.raises(MemoryError):
        arena.acquire(1024, np.int64)


def test_arena_pool_cap():
    arena = BufferArena(max_bytes=1 << 30, max_buffers_per_class=1)
    a = arena.acquire(10, np.int64)
    b = arena.acquire(10, np.int64)
    arena.release(a)
    arena.release(b)  # pool full -> dropped and deallocated
    assert arena.stats()["allocated_bytes"] == 1024 * 8


def test_feeder_yields_all_chunks_in_order():
    feeder = DeviceFeeder(num_buffers=2)
    chunks = [np.full(4, i) for i in range(7)]
    out = list(feeder.feed(iter(chunks)))
    assert len(out) == 7
    for i, c in enumerate(out):
        assert int(np.asarray(c)[0]) == i


def test_feeder_single_buffer():
    feeder = DeviceFeeder(num_buffers=1)
    out = list(feeder.feed(iter([np.zeros(2)])))
    assert len(out) == 1


def test_pad_chunk():
    out = pad_chunk(np.arange(5), 8)
    assert out.shape == (8,)
    assert list(out[:5]) == [0, 1, 2, 3, 4]
    same = pad_chunk(np.arange(8), 8)
    assert same.shape == (8,)


def test_stream_reduce_out_of_core_sum():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(state, chunk):
        return state + jnp.sum(chunk)

    chunks = (np.full(100, i, dtype=np.int64) for i in range(10))
    total = stream_reduce(chunks, step, jnp.asarray(0, jnp.int64), num_buffers=3)
    assert int(total) == sum(100 * i for i in range(10))
