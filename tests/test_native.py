"""Native C++ kernel tests (ctypes-loaded; every function has a NumPy
fallback, so these skip rather than fail when no toolchain is present)."""

import numpy as np
import pyarrow as pa
import pytest

from gpu_olap_tpu import native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def _buffers(strings):
    arr = pa.array(strings, type=pa.string())
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32).astype(np.int64)
    return data, offsets


def test_dict_encode_sorted_and_exact():
    strings = ["pear", "apple", "pear", "banana", "apple"]
    data, offsets = _buffers(strings)
    codes, dictionary = native.dict_encode_utf8(data, offsets, None)
    assert list(dictionary) == ["apple", "banana", "pear"]  # sorted
    assert [dictionary[c] for c in codes] == strings


def test_dict_encode_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    strings = [f"w{int(i):04d}" for i in rng.integers(0, 500, 10_000)]
    data, offsets = _buffers(strings)
    codes, dictionary = native.dict_encode_utf8(data, offsets, None)
    from gpu_olap_tpu.interop.columnar import dict_encode_strings

    c2, d2, _ = dict_encode_strings(np.array(strings, dtype=object))
    assert list(dictionary) == list(d2)
    np.testing.assert_array_equal(codes, c2)


def test_dict_encode_with_validity():
    strings = ["a", "b", "a", "c"]
    data, offsets = _buffers(strings)
    validity = np.array([1, 0, 1, 1], dtype=np.uint8)
    codes, dictionary = native.dict_encode_utf8(data, offsets, validity)
    assert codes[1] == 0  # null rows coded 0
    assert dictionary[codes[0]] == "a"
    assert dictionary[codes[3]] == "c"


def test_fnv1a_hash_known_values():
    # FNV-1a 64-bit of "a" is 0xaf63dc4c8601ec8c; we mask the sign bit
    data, offsets = _buffers(["a", ""])
    h = native.fnv1a_hash64(data, offsets)
    assert h[0] == (0xAF63DC4C8601EC8C & 0x7FFFFFFFFFFFFFFF)
    assert h[1] == (0xCBF29CE484222325 & 0x7FFFFFFFFFFFFFFF)  # empty = basis


def test_unpack_bitmap():
    bits = np.array([0b10110101], dtype=np.uint8)
    out = native.unpack_bitmap(bits, 0, 8)
    assert list(out) == [True, False, True, False, True, True, False, True]
    out = native.unpack_bitmap(bits, 2, 3)
    assert list(out) == [True, False, True]


def test_arrow_string_ingestion_uses_native_and_matches():
    from gpu_olap_tpu.interop import arrow as arrow_io

    table = pa.table({"s": pa.array(["z", "y", None, "z", "abc"])})
    batch = arrow_io.batch_from_arrow(table)
    col = batch.column(0)
    assert list(col.dictionary) == sorted(set(["z", "y", "abc"]))
    back = arrow_io.batch_to_arrow(batch)
    assert back.column("s").to_pylist() == ["z", "y", None, "z", "abc"]


def test_int64_minmax_matches_numpy():
    from gpu_olap_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    d = rng.integers(-1000, 1 << 40, 100_000).astype(np.int64)
    assert native.int64_minmax(d) == (int(d.min()), int(d.max()))


def test_int64_unique_bounded():
    from gpu_olap_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    u = np.arange(10_000, dtype=np.int64)
    np.random.default_rng(4).shuffle(u)
    assert native.int64_unique_bounded(u, 0, 9_999) is True
    u[7] = u[8]
    assert native.int64_unique_bounded(u, 0, 9_999) is False
    # span too large for a bitmap -> None (caller falls back)
    assert native.int64_unique_bounded(u, 0, 1 << 40) is None
    # values outside the claimed range -> not unique under that range
    assert native.int64_unique_bounded(np.array([5, 20], dtype=np.int64),
                                       0, 9) is False
