"""Columnar / Arrow interchange tests — round-trip parity mirroring the
reference's conversion tests (``record_batch_convert.rs:184-218``,
``column_buffer.rs:112-127``, ``schema_utils.rs:36-59``)."""

import numpy as np
import pyarrow as pa
import pytest

from gpu_olap_tpu.interop import arrow as arrow_io
from gpu_olap_tpu.interop.columnar import (
    ColumnBatch, DType, Field, Schema, concat_batches, dict_encode_strings,
)


def test_widening_int_types():
    table = pa.table({
        "i8": pa.array([1, 2], type=pa.int8()),
        "i16": pa.array([1, 2], type=pa.int16()),
        "i32": pa.array([1, 2], type=pa.int32()),
        "u32": pa.array([1, 2], type=pa.uint32()),
        "f32": pa.array([1.5, 2.5], type=pa.float32()),
    })
    batch = arrow_io.batch_from_arrow(table)
    # everything widened to 8 bytes (column_buffer.rs:17-21)
    assert all(f.dtype in (DType.INT64, DType.FLOAT64) for f in batch.schema)
    assert batch.column(0).data.dtype == np.int64
    assert batch.column(4).data.dtype == np.float64


def test_null_round_trip():
    table = pa.table({
        "x": pa.array([1, None, 3], type=pa.int64()),
        "y": pa.array([1.0, 2.0, None], type=pa.float64()),
    })
    batch = arrow_io.batch_from_arrow(table)
    # nulls preserved as validity masks (fixes arrow-interop/src/lib.rs:15-17)
    assert batch.column(0).validity is not None
    assert list(batch.column(0).validity) == [True, False, True]
    back = arrow_io.batch_to_arrow(batch)
    assert back.column("x").null_count == 1
    assert back.column("y").null_count == 1
    assert back.column("x").to_pylist() == [1, None, 3]


def test_string_dictionary_round_trip():
    table = pa.table({"s": pa.array(["b", "a", None, "b"])})
    batch = arrow_io.batch_from_arrow(table)
    assert batch.schema.field(0).dtype is DType.STRING
    assert batch.column(0).dictionary is not None
    back = arrow_io.batch_to_arrow(batch)
    assert back.column("s").to_pylist() == ["b", "a", None, "b"]


def test_timestamp_widening():
    ts = pa.array([0, 86_400_000], type=pa.timestamp("ms"))
    table = pa.table({"t": ts})
    batch = arrow_io.batch_from_arrow(table)
    assert batch.schema.field(0).dtype is DType.TIMESTAMP_MS
    assert batch.column(0).data.dtype == np.int64
    back = arrow_io.batch_to_arrow(batch)
    assert back.column("t").type == pa.timestamp("ms")


def test_unsupported_type_rejected():
    table = pa.table({"l": pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))})
    # list types rejected like reference is_gpu_compatible (schema_utils.rs:29-33)
    with pytest.raises(TypeError):
        arrow_io.batch_from_arrow(table)


def test_schema_resolution():
    s = Schema([Field("t.a", DType.INT64), Field("t.b", DType.INT64),
                Field("u.a", DType.INT64)])
    assert s.index_of("t.b") == 1
    assert s.index_of("b") == 1
    with pytest.raises(KeyError):
        s.index_of("a")  # ambiguous between t.a and u.a
    with pytest.raises(KeyError):
        s.index_of("zzz")


def test_schema_row_byte_width():
    s = Schema([Field("a", DType.INT64), Field("b", DType.FLOAT64),
                Field("c", DType.BOOL)])
    assert s.row_byte_width() == 17


def test_dict_encode_strings():
    codes, dictionary, validity = dict_encode_strings(
        np.array(["x", "y", "x", None], dtype=object)
    )
    assert list(dictionary[codes[:3]]) == ["x", "y", "x"]
    assert validity is not None and not validity[3]


def test_from_dict_and_pandas_round_trip():
    import pandas as pd

    df = pd.DataFrame({"a": [1, 2, 3], "s": ["p", "q", "p"], "f": [0.5, np.nan, 1.5]})
    batch = arrow_io.batch_from_pandas(df)
    back = arrow_io.batch_to_pandas(batch)
    assert list(back["a"]) == [1, 2, 3]
    assert list(back["s"]) == ["p", "q", "p"]
    assert np.isnan(back["f"][1])


def test_concat_batches():
    b1 = ColumnBatch.from_dict({"a": np.array([1, 2]), "s": np.array(["x", "y"])})
    b2 = ColumnBatch.from_dict({"a": np.array([3]), "s": np.array(["z"])})
    merged = concat_batches([b1, b2])
    assert merged.num_rows == 3
    d = merged.to_pydict()
    assert list(d["a"]) == [1, 2, 3]
    assert list(d["s"]) == ["x", "y", "z"]


def test_parquet_round_trip(tmp_path):
    import pyarrow.parquet as pq

    table = pa.table({"k": np.arange(100, dtype=np.int64),
                      "v": np.arange(100, dtype=np.float64)})
    path = str(tmp_path / "t.parquet")
    pq.write_table(table, path)
    schema, nrows = arrow_io.read_parquet_schema(path)
    assert nrows == 100 and len(schema) == 2
    batch = arrow_io.read_parquet(path)
    assert batch.num_rows == 100
    chunks = list(arrow_io.iter_parquet_chunks(path, batch_size=30))
    assert [c.num_rows for c in chunks] == [30, 30, 30, 10]
