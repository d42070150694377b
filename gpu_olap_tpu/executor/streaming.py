"""Out-of-core streamed execution.

The reference plans unified-memory oversubscription + batch_size-chunked
streaming for tables larger than device memory (README.md:338-352,
``lib.rs:27-28``) but implements none of it.  Here: aggregation pipelines over
uncached (larger-than-threshold) Parquet tables stream host chunks through the
double-buffered feeder into a jitted *partial-aggregate + merge* step with a
fixed-shape device-resident group state — transfers overlap compute, peak HBM
use is one chunk + the group state, and results are exact for the mergeable
aggregates (SUM/COUNT/MIN/MAX/AVG as sum+count).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..config import EngineConfig
from ..interop.columnar import Column, ColumnBatch, DType, Schema
from ..mem.feeder import DeviceFeeder
from ..ops import aggregate as agg_ops
from ..ops import filter as filter_ops
from ..ops.dtypes import INT64_MAX, INT64_MIN, key_code
from ..plan import physical as P
from ..utils.jaxenv import ensure_jax
from ..utils.tracing import get_logger

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402

logger = get_logger(__name__)


class NotStreamable(Exception):
    """Plan shape not supported by the streaming path."""


@dataclasses.dataclass
class _StreamablePipeline:
    scan: P.TpuTableScan
    # operators between scan and aggregate, bottom-up (filters/projections)
    middle: List[P.PhysicalPlan]
    aggregate: P.TpuAggregate


def match_streamable(plan: P.PhysicalPlan) -> _StreamablePipeline:
    """Aggregate over (Filter|Projection)* over a single TableScan."""
    if not isinstance(plan, P.TpuAggregate):
        raise NotStreamable(type(plan).__name__)
    if any(a.distinct for a in plan.aggs):
        raise NotStreamable("COUNT(DISTINCT) is not mergeable across chunks")
    middle: List[P.PhysicalPlan] = []
    node = plan.input
    while isinstance(node, (P.TpuFilter, P.TpuProjection)):
        middle.append(node)
        node = node.input
    if not isinstance(node, P.TpuTableScan):
        raise NotStreamable(type(node).__name__)
    return _StreamablePipeline(node, list(reversed(middle)), plan)


class StreamingAggregator:
    """Chunked scan -> filter/project -> partial group-by -> state merge."""

    def __init__(self, catalog, config: EngineConfig, interpreter_cls):
        self.catalog = catalog
        self.config = config
        self._interpreter_cls = interpreter_cls

    def execute(self, plan: P.PhysicalPlan) -> ColumnBatch:
        pipe = match_streamable(plan)
        agg = pipe.aggregate
        chunk_rows = self.config.batch_size
        max_groups = min(self.config.max_groups, 1 << 22)
        n_keys = len(agg.group_exprs)

        # state: per key (codes, nulls); per agg a set of partial columns
        partials = _partial_layout(agg)

        step = self._build_step(pipe, chunk_rows, max_groups, partials)

        state = _init_state(agg.group_exprs, partials, max_groups)
        feeder = DeviceFeeder(num_buffers=self.config.num_feed_buffers)
        cols = [f.name for f in self.catalog.get_schema(pipe.scan.table_name)
                ] if pipe.scan.projection is None else [
            self.catalog.get_schema(pipe.scan.table_name).field(i).name
            for i in pipe.scan.projection
        ]
        chunks = self.catalog.iter_table_chunks(
            pipe.scan.table_name, chunk_rows, columns=cols
        )

        def host_iter():
            for batch in chunks:
                yield _pad_batch_arrays(batch, chunk_rows)

        n_chunks = 0
        for dev_chunk in feeder.feed(host_iter()):
            state = step(state, *dev_chunk)
            n_chunks += 1
        logger.info("streamed %d chunks of %d rows", n_chunks, chunk_rows)

        return self._finalize(agg, state, max_groups)

    # ------------------------------------------------------------------
    def _build_step(self, pipe: _StreamablePipeline, chunk_rows: int,
                    max_groups: int, partials):
        interp = self._interpreter_cls(self.config, {}, {}, {
            "flag_names": [], "capacities": {}})
        scan_schema = pipe.scan.schema
        table_schema = self.catalog.get_schema(pipe.scan.table_name)
        dicts = []
        host = None
        # dictionaries for string columns come from catalog metadata; for
        # uncached parquet we read just the schema (dictionaries are built
        # per-chunk, so string group keys are unsupported when streaming)
        for f in (table_schema if pipe.scan.projection is None else
                  (table_schema.field(i) for i in pipe.scan.projection)):
            if f.dtype is DType.STRING:
                raise NotStreamable("string group keys/payloads while streaming")
            dicts.append(None)

        from .device import DevBatch, DevCol

        agg = pipe.aggregate

        def step(state, valid_rows, *arrays):
            cols = [DevCol(a, None, None) for a in arrays]
            row_valid = jnp.arange(chunk_rows) < valid_rows
            batch = DevBatch(scan_schema, cols, chunk_rows, row_valid)
            for op in pipe.middle:
                if isinstance(op, P.TpuFilter):
                    data, valid, _ = interp.eval_expr(op.predicate, batch)
                    mask = filter_ops.combine_mask(batch.row_valid, data, valid)
                    batch = DevBatch(op.schema, batch.cols, batch.capacity, mask)
                else:
                    ncols = []
                    for e in op.exprs:
                        d, v, dd = interp.eval_expr(e, batch)
                        ncols.append(DevCol(d, v, dd))
                    batch = DevBatch(op.schema, ncols, batch.capacity, batch.row_valid)

            # chunk keys/values + state keys/values -> one grouped pass
            chunk_keys = []
            for g in agg.group_exprs:
                d, v, _ = interp.eval_expr(g, batch)
                from .device import _np_kind

                chunk_keys.append(key_code(d, v, _np_kind(g.dtype)))

            state_keys, state_partials, state_valid = state
            keys = [
                (jnp.concatenate([ck, sk]), jnp.concatenate([cn, sn]))
                for (ck, cn), (sk, sn) in zip(chunk_keys, state_keys)
            ] if chunk_keys else []
            all_valid = jnp.concatenate([
                batch.row_valid if batch.row_valid is not None
                else jnp.ones(chunk_rows, bool),
                state_valid,
            ])

            specs = []
            for spec_group, a in zip(partials, agg.aggs):
                chunk_vals = {}
                if a.arg is not None:
                    data, valid, _ = interp.eval_expr(a.arg, batch)
                else:
                    data, valid = None, None
                for pname, pfunc, pdtype in spec_group:
                    if pfunc == "count":
                        cv = jnp.where(
                            (jnp.ones(chunk_rows, bool) if valid is None else valid)
                            if data is not None else jnp.ones(chunk_rows, bool),
                            1, 0).astype(jnp.int64)
                        cvalid = None
                    else:
                        cv = data.astype(pdtype)
                        cvalid = valid
                    sp_idx = len(specs)
                    sv = state_partials[sp_idx]
                    merged_vals = jnp.concatenate([cv, sv])
                    merged_valid = None
                    if cvalid is not None:
                        merged_valid = jnp.concatenate([
                            cvalid, jnp.ones(sv.shape[0], bool)])
                    specs.append({
                        "func": "sum" if pfunc == "count" else pfunc,
                        "values": merged_vals, "valid": merged_valid,
                        "distinct": False, "acc_dtype": pdtype,
                    })

            group_codes, results, n_groups, overflow = agg_ops.groupby_aggregate(
                keys, all_valid, specs, max_groups,
                n_rows=chunk_rows + max_groups,
            )
            new_keys = group_codes
            new_partials = [r[0] for r in results]
            new_valid = (jnp.arange(max_groups) < n_groups) if keys else \
                jnp.ones(1, bool)
            if not keys:
                new_keys = []
            return (new_keys, new_partials, new_valid)

        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _finalize(self, agg: P.TpuAggregate, state, max_groups: int) -> ColumnBatch:
        from .device import _decode_key

        state_keys, state_partials, state_valid = state
        valid = np.asarray(state_valid)
        if not agg.group_exprs and not valid.any():
            # zero chunks streamed: global aggregate still yields one row
            valid = np.ones_like(valid)
        idx = np.nonzero(valid)[0]

        cols: List[Column] = []
        for (code, null), g in zip(state_keys, agg.group_exprs):
            dc = _decode_key(jnp.asarray(code), jnp.asarray(null), g.dtype, None)
            cols.append(Column(np.asarray(dc.data)[idx],
                               np.asarray(dc.validity)[idx]
                               if dc.validity is not None else None))

        partials = _partial_layout(agg)
        p_i = 0
        for spec_group, a in zip(partials, agg.aggs):
            vals = {}
            for pname, pfunc, pdtype in spec_group:
                vals[pname] = np.asarray(state_partials[p_i])[idx]
                p_i += 1
            cols.append(_finalize_agg(a, vals))
        return ColumnBatch(agg.schema, cols, len(idx))


def _partial_layout(agg: P.TpuAggregate):
    """Per output aggregate, the mergeable partial columns it needs."""
    out = []
    for a in agg.aggs:
        if a.func == "count":
            out.append([("count", "count", np.int64)])
        elif a.func == "avg":
            out.append([("sum", "sum", np.float64), ("count", "count", np.int64)])
        elif a.func == "sum":
            out.append([("sum", "sum", a.out_dtype.numpy_dtype),
                        ("count", "count", np.int64)])
        elif a.func in ("min", "max"):
            out.append([(a.func, a.func, a.out_dtype.numpy_dtype),
                        ("count", "count", np.int64)])
        else:
            raise NotStreamable(a.func)
    return out


def _finalize_agg(a: P.AggSpec, vals) -> Column:
    if a.func == "count":
        return Column(vals["count"])
    cnt = vals["count"]
    has = cnt > 0
    if a.func == "avg":
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = vals["sum"] / np.maximum(cnt, 1)
        return Column(np.where(has, avg, 0.0), None if has.all() else has)
    key = "sum" if a.func == "sum" else a.func
    data = vals[key]
    return Column(data, None if has.all() else has)


def _init_state(group_exprs, partials, max_groups: int):
    if group_exprs:
        keys = []
        for g in group_exprs:
            if g.dtype is DType.FLOAT64:
                keys.append((jnp.full(max_groups, -jnp.inf, dtype=jnp.float64),
                             jnp.zeros(max_groups, dtype=bool)))
            else:
                keys.append((jnp.full(max_groups, INT64_MIN, dtype=jnp.int64),
                             jnp.zeros(max_groups, dtype=bool)))
        rows = max_groups
        valid = jnp.zeros(max_groups, dtype=bool)
    else:
        keys = []
        rows = 1  # global aggregate: single-row mergeable state
        valid = jnp.zeros(1, dtype=bool)
    state_partials = []
    for spec_group in partials:
        for pname, pfunc, pdtype in spec_group:
            if pfunc == "min":
                fill = np.inf if np.dtype(pdtype).kind == "f" else INT64_MAX
            elif pfunc == "max":
                fill = -np.inf if np.dtype(pdtype).kind == "f" else INT64_MIN
            else:
                fill = 0
            state_partials.append(jnp.full(rows, fill, dtype=pdtype))
    return (keys, state_partials, valid)


def _pad_batch_arrays(batch: ColumnBatch, chunk_rows: int):
    """Host batch -> (valid_rows, *padded arrays) ready for device_put."""
    n = batch.num_rows
    out = [np.int64(n)]
    for c in batch.columns:
        a = np.asarray(c.data)
        if a.shape[0] < chunk_rows:
            pad = np.zeros(chunk_rows, dtype=a.dtype)
            pad[:n] = a
            a = pad
        elif a.shape[0] > chunk_rows:
            raise ValueError("chunk larger than batch_size")
        out.append(a)
    return tuple(out)
