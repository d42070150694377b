"""gpu_olap_tpu — a TPU-native vectorized SQL query-execution engine.

Brand-new implementation of the capability surface of the reference GPU OLAP
engine (``codebasecomprehension987/gpu-olap-engine``; see SURVEY.md): SQL ->
logical plan -> rule-based optimizer -> physical plan -> columnar execution,
with the compute path on JAX/XLA/Pallas over TPU (sort-merge & radix hash join,
segmented hash aggregation, fused filter, radix-partitioned multi-host shuffle)
and the runtime around it (catalog, Arrow interchange, buffer arenas,
double-buffered host feeding) designed TPU-first.
"""

from .catalog import Catalog
from .config import EngineConfig
from .engine import GpuOlapEngine, OlapEngine, TpuOlapEngine
from .executor.result import QueryResult
from .interop.columnar import Column, ColumnBatch, DType, Field, Schema
from .sql.parser import parse_sql

__version__ = "0.1.0"

__all__ = [
    "Catalog", "Column", "ColumnBatch", "DType", "EngineConfig", "Field",
    "GpuOlapEngine", "OlapEngine", "QueryResult", "Schema", "TpuOlapEngine",
    "parse_sql",
]
