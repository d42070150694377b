"""Distributed plan executor: SQL pipelines over a device mesh.

Executes the engine's physical plans with tables row-sharded over the
``hosts`` axis and operators as one ``shard_map`` program per pipeline:
local scan/filter/projection (elementwise — no communication), hash-partition
all-to-all shuffle, then the local sort-based join/aggregate kernels
(BASELINE north star: shuffle overlapped with probe/aggregate compute).

Supported pipeline shapes (the BASELINE workload set):
  * Aggregate over (Filter|Projection)* over Scan          — shuffle group-by
  * Aggregate over (Filter|Proj)* over Join(scan-side pipelines)
                                                            — shuffle join
Anything else raises ``NotDistributable`` and the engine falls back to the
single-device path.  Operators *above* the aggregate (HAVING / ORDER BY /
LIMIT / final projection) run on the gathered group results via the host
executor — group outputs are small after aggregation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import EngineConfig
from ..interop.columnar import Column, ColumnBatch, DType
from ..ops import aggregate as agg_ops
from ..ops import join as join_ops
from ..ops.dtypes import key_code
from ..plan import physical as P
from ..utils.jaxenv import ensure_jax
from ..utils.tracing import get_logger
from .mesh import AXIS, make_mesh, row_sharding
from .shuffle import shuffle_rows_local

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as Pspec  # noqa: E402

logger = get_logger(__name__)


class NotDistributable(Exception):
    pass


@dataclasses.dataclass
class _ScanPipeline:
    scan: P.TpuTableScan
    middle: List[P.PhysicalPlan]  # bottom-up filters/projections


def _match_scan_pipeline(node: P.PhysicalPlan) -> _ScanPipeline:
    middle: List[P.PhysicalPlan] = []
    while isinstance(node, (P.TpuFilter, P.TpuProjection)):
        middle.append(node)
        node = node.input
    if not isinstance(node, P.TpuTableScan):
        raise NotDistributable(type(node).__name__)
    return _ScanPipeline(node, list(reversed(middle)))


@dataclasses.dataclass
class _DistPlan:
    aggregate: P.TpuAggregate
    agg_middle: List[P.PhysicalPlan]   # filters/projections between agg and join
    join: Optional[P.TpuHashJoin]
    left: Optional[_ScanPipeline]
    right: Optional[_ScanPipeline]
    single: Optional[_ScanPipeline]


def match_distributable(plan: P.PhysicalPlan) -> _DistPlan:
    if not isinstance(plan, P.TpuAggregate):
        raise NotDistributable(type(plan).__name__)
    if any(a.distinct for a in plan.aggs):
        raise NotDistributable("COUNT(DISTINCT) distributed")
    middle: List[P.PhysicalPlan] = []
    node = plan.input
    while isinstance(node, (P.TpuFilter, P.TpuProjection)):
        middle.append(node)
        node = node.input
    middle = list(reversed(middle))
    if isinstance(node, P.TpuHashJoin):
        if node.join_type != "inner" or node.residual is not None:
            raise NotDistributable("non-inner or residual join")
        if len(node.left_keys) != 1:
            raise NotDistributable("multi-key distributed join")
        return _DistPlan(plan, middle, node,
                         _match_scan_pipeline(node.left),
                         _match_scan_pipeline(node.right), None)
    # plain scan pipeline
    mid2 = middle
    sp = _match_scan_pipeline(plan.input)
    return _DistPlan(plan, [], None, None, None, sp)


class DistributedExecutor:
    """Runs distributable plans over a mesh; raises NotDistributable else."""

    def __init__(self, catalog, config: EngineConfig, interpreter_cls,
                 mesh=None):
        self.catalog = catalog
        self.config = config
        self._interp_cls = interpreter_cls
        if mesh is None:
            n = config.mesh_shape[0] if config.mesh_shape else 1
            mesh = make_mesh(n)
        self.mesh = mesh
        self.ndev = self.mesh.devices.size
        self._compiled: Dict[tuple, tuple] = {}

    # -- table sharding ----------------------------------------------------
    def _sharded_table(self, scan: P.TpuTableScan):
        host = self.catalog.get_table_data(scan.table_name).to_numpy()
        n = host.num_rows
        per_dev = -(-max(n, 1) // self.ndev)
        cap = per_dev * self.ndev
        arrays = []
        dicts = []
        sharding = row_sharding(self.mesh)
        indices = scan.projection if scan.projection is not None else range(len(host.columns))
        for i in indices:
            col = host.columns[i]
            if host.schema.field(i).dtype is DType.STRING:
                raise NotDistributable("string columns in distributed pipeline")
            data = np.zeros(cap, dtype=col.data.dtype)
            data[:n] = col.data
            varr = None
            if col.validity is not None:
                v = np.zeros(cap, dtype=bool)
                v[:n] = col.validity
                varr = jax.device_put(v, sharding)
            arrays.append((jax.device_put(data, sharding), varr))
            dicts.append(None)
        rowmask = np.zeros(cap, dtype=bool)
        rowmask[:n] = True
        return arrays, jax.device_put(rowmask, sharding), cap // self.ndev, dicts

    # -- execution ---------------------------------------------------------
    def execute(self, plan: P.PhysicalPlan) -> ColumnBatch:
        dp, above = _split_above_aggregate(plan)
        batch = self._execute_aggregate(dp)
        if above:
            from ..executor.cpu import CpuExecutor

            cpu = CpuExecutor(self.catalog, self.config)
            cpu.leaf_results = {id(dp.aggregate): batch}
            return cpu.execute(plan)
        return batch

    def _execute_aggregate(self, dp: _DistPlan) -> ColumnBatch:
        agg = dp.aggregate
        if dp.join is None:
            return self._run_groupby_pipeline(dp)
        return self._run_join_pipeline(dp)

    # ------------------------------------------------------------------
    def _run_groupby_pipeline(self, dp: _DistPlan) -> ColumnBatch:
        sp = dp.single
        agg = dp.aggregate
        if not agg.group_exprs:
            return self._run_global_pipeline(dp)
        arrays, rowmask, per_dev, dicts = self._sharded_table(sp.scan)
        interp = self._interp_cls(self.config, {}, {}, {"flag_names": [],
                                                        "capacities": {}})
        ndev = self.ndev
        capacity = max(per_dev * 2, 128)
        max_groups = min(self.config.max_groups, per_dev * ndev, 1 << 20)

        from ..executor.device import DevBatch, DevCol, _np_kind

        n_cols = len(arrays)
        in_specs = tuple(Pspec(AXIS) for _ in range(1 + 2 * n_cols))
        out_specs = (
            tuple((Pspec(AXIS), Pspec(AXIS)) for _ in agg.group_exprs),
            tuple((Pspec(AXIS), Pspec(AXIS)) for _ in agg.aggs),
            Pspec(AXIS),
        )

        @functools.partial(shard_map, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        def program(rowmask_l, *flat_arrays):
            cols = []
            for i in range(n_cols):
                d = flat_arrays[2 * i]
                v = flat_arrays[2 * i + 1]
                v = None if v.shape[0] == 0 else v
                cols.append(DevCol(d, v, None))
            batch = DevBatch(sp.scan.schema, cols, rowmask_l.shape[0], rowmask_l)
            batch = _apply_middle(interp, sp.middle, batch)
            # evaluate keys and agg args locally, shuffle by first key hash
            key_pairs = []
            for g in agg.group_exprs:
                d, v, _ = interp.eval_expr(g, batch)
                key_pairs.append(key_code(d, v, _np_kind(g.dtype)))
            payload = []
            payload_valid = []
            for a in agg.aggs:
                if a.arg is None:
                    continue
                d, v, _ = interp.eval_expr(a.arg, batch)
                payload.append(d)
                payload_valid.append(v)
            # ship: key codes + null flags + payloads + payload validities
            ship = []
            for code, null in key_pairs:
                ship += [code, null]
            for d, v in zip(payload, payload_valid):
                ship.append(d)
                ship.append(v if v is not None else jnp.ones(d.shape[0], bool))
            part_key = _partition_key(key_pairs[0])
            rk, shipped, rvalid, _ = shuffle_rows_local(
                part_key, ship, batch.row_valid, ndev, capacity
            )
            # rebuild keys/payloads post-shuffle
            it = iter(shipped)
            keys2 = []
            for _g in agg.group_exprs:
                code = next(it)
                null = next(it)
                keys2.append((code, null.astype(bool)))
            specs = []
            pi = 0
            for a in agg.aggs:
                if a.arg is None:
                    specs.append({"func": a.func, "values": None, "valid": None,
                                  "distinct": False,
                                  "acc_dtype": a.out_dtype.numpy_dtype})
                    continue
                vals = next(it)
                valid = next(it).astype(bool)
                specs.append({"func": a.func, "values": vals, "valid": valid,
                              "distinct": False,
                              "acc_dtype": a.out_dtype.numpy_dtype})
            group_codes, results, n_groups, _of = agg_ops.groupby_aggregate(
                keys2, rvalid, specs, max_groups, n_rows=rk.shape[0]
            )
            gvalid = jnp.arange(max_groups) < n_groups
            return (
                tuple((c, n) for c, n in group_codes),
                tuple((r[0],
                       r[1] if r[1] is not None else jnp.ones(max_groups, bool))
                      for r in results),
                gvalid,
            )

        flat = []
        for d, v in arrays:
            flat.append(d)
            flat.append(v if v is not None else
                        jax.device_put(np.zeros(0, dtype=bool),
                                       row_sharding(self.mesh)))
        gkeys, gresults, gvalid = jax.jit(program)(rowmask, *flat)
        return _gather_groups(agg, gkeys, gresults, gvalid)

    # ------------------------------------------------------------------
    def _run_global_pipeline(self, dp: _DistPlan) -> ColumnBatch:
        """Global aggregate (no GROUP BY): per-device partials + psum/pmin/pmax
        collectives — no shuffle needed."""
        sp = dp.single
        agg = dp.aggregate
        arrays, rowmask, per_dev, _ = self._sharded_table(sp.scan)
        interp = self._interp_cls(self.config, {}, {}, {"flag_names": [],
                                                        "capacities": {}})

        from ..executor.device import DevBatch, DevCol

        n_cols = len(arrays)
        in_specs = tuple(Pspec(AXIS) for _ in range(1 + 2 * n_cols))
        out_specs = tuple((Pspec(), Pspec()) for _ in agg.aggs)

        @functools.partial(shard_map, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        def program(rowmask_l, *flat_arrays):
            cols = []
            for i in range(n_cols):
                d = flat_arrays[2 * i]
                v = flat_arrays[2 * i + 1]
                v = None if v.shape[0] == 0 else v
                cols.append(DevCol(d, v, None))
            batch = DevBatch(sp.scan.schema, cols, rowmask_l.shape[0], rowmask_l)
            batch = _apply_middle(interp, sp.middle, batch)
            rv = (batch.row_valid if batch.row_valid is not None
                  else jnp.ones(batch.capacity, bool))
            outs = []
            for a in agg.aggs:
                if a.arg is None:
                    cnt = jax.lax.psum(jnp.sum(rv.astype(jnp.int64)), AXIS)
                    outs.append((cnt.reshape(1), jnp.ones(1, bool)))
                    continue
                d, v, _ = interp.eval_expr(a.arg, batch)
                valid = rv if v is None else (rv & v)
                acc = a.out_dtype.numpy_dtype
                cnt = jax.lax.psum(jnp.sum(valid.astype(jnp.int64)), AXIS)
                has = (cnt > 0).reshape(1)
                if a.func == "count":
                    outs.append((cnt.reshape(1), jnp.ones(1, bool)))
                elif a.func == "sum":
                    s = jax.lax.psum(
                        jnp.sum(jnp.where(valid, d.astype(acc),
                                          jnp.asarray(0, acc))), AXIS)
                    outs.append((s.reshape(1), has))
                elif a.func == "avg":
                    s = jax.lax.psum(
                        jnp.sum(jnp.where(valid, d.astype(jnp.float64), 0.0)),
                        AXIS)
                    outs.append(((s / jnp.maximum(cnt, 1)).reshape(1), has))
                elif a.func in ("min", "max"):
                    if np.dtype(acc).kind == "f":
                        ident = np.inf if a.func == "min" else -np.inf
                    else:
                        ident = (np.iinfo(np.int64).max if a.func == "min"
                                 else np.iinfo(np.int64).min)
                    masked = jnp.where(valid, d.astype(acc),
                                       jnp.asarray(ident, acc))
                    local = jnp.min(masked) if a.func == "min" else jnp.max(masked)
                    red = (jax.lax.pmin if a.func == "min" else jax.lax.pmax)(
                        local, AXIS)
                    outs.append((jnp.where(cnt > 0, red,
                                           jnp.asarray(0, acc)).reshape(1), has))
                else:
                    raise NotDistributable(a.func)
            return tuple(outs)

        flat = []
        for d, v in arrays:
            flat.append(d)
            flat.append(v if v is not None else
                        jax.device_put(np.zeros(0, dtype=bool),
                                       row_sharding(self.mesh)))
        outs = jax.jit(program)(rowmask, *flat)
        cols = []
        for (data, has), a in zip(outs, agg.aggs):
            d = np.asarray(data)
            h = np.asarray(has)
            v = None if (h.all() or a.func == "count") else h
            cols.append(Column(d, v))
        return ColumnBatch(agg.schema, cols, 1)

    # ------------------------------------------------------------------
    def _run_join_pipeline(self, dp: _DistPlan) -> ColumnBatch:
        """Distributed join + aggregation: both sides shuffled by join-key
        hash, local sort-probe join, then a second shuffle by group key and
        local aggregation (one shard_map program — XLA overlaps the
        all-to-alls with local sort/probe compute)."""
        agg = dp.aggregate
        join = dp.join
        l_arrays, l_rowmask, l_per_dev, _ = self._sharded_table(dp.left.scan)
        r_arrays, r_rowmask, r_per_dev, _ = self._sharded_table(dp.right.scan)
        interp = self._interp_cls(self.config, {}, {}, {"flag_names": [],
                                                        "capacities": {}})
        ndev = self.ndev
        shuffle_cap = max(max(l_per_dev, r_per_dev) * 2, 128)
        join_cap = max(int((l_per_dev + r_per_dev) * self.config.join_expansion),
                       256)
        regroup_cap = max(join_cap * 2, 256)
        max_groups = min(self.config.max_groups, 1 << 20)

        from ..executor.device import DevBatch, DevCol, _np_kind
        from ..ops import join as join_ops

        n_lcols = len(l_arrays)
        n_rcols = len(r_arrays)
        in_specs = tuple(Pspec(AXIS) for _ in range(2 + 2 * (n_lcols + n_rcols)))
        out_specs = (
            tuple((Pspec(AXIS), Pspec(AXIS)) for _ in agg.group_exprs),
            tuple((Pspec(AXIS), Pspec(AXIS)) for _ in agg.aggs),
            Pspec(AXIS),
            Pspec(),
        )

        @functools.partial(shard_map, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        def program(lmask, rmask, *flat):
            def build_side(mask, flat_arrays, n_cols, scan, middle):
                cols = []
                for i in range(n_cols):
                    d = flat_arrays[2 * i]
                    v = flat_arrays[2 * i + 1]
                    v = None if v.shape[0] == 0 else v
                    cols.append(DevCol(d, v, None))
                b = DevBatch(scan.schema, cols, mask.shape[0], mask)
                return _apply_middle(interp, middle, b)

            lb = build_side(lmask, flat[: 2 * n_lcols], n_lcols,
                            dp.left.scan, dp.left.middle)
            rb = build_side(rmask, flat[2 * n_lcols:], n_rcols,
                            dp.right.scan, dp.right.middle)

            def keyed_shuffle(batch, key_expr):
                d, v, _ = interp.eval_expr(key_expr, batch)
                code, null = key_code(d, v, _np_kind(key_expr.dtype))
                part = _partition_key((code, null))
                ship = [code, null]
                for c in batch.cols:
                    ship.append(c.data)
                    ship.append(c.validity if c.validity is not None
                                else jnp.ones(c.data.shape[0], bool))
                rk, shipped, rvalid, of = shuffle_rows_local(
                    part, ship, batch.row_valid, ndev, shuffle_cap)
                it = iter(shipped)
                code2 = next(it)
                null2 = next(it).astype(bool)
                cols2 = []
                for _c in batch.cols:
                    d2 = next(it)
                    v2 = next(it).astype(bool)
                    cols2.append(DevCol(d2, v2, None))
                b2 = DevBatch(batch.schema, cols2, rk.shape[0], rvalid)
                return b2, (code2, null2), of

            lb2, lkey, of1 = keyed_shuffle(lb, join.left_keys[0])
            rb2, rkey, of2 = keyed_shuffle(rb, join.right_keys[0])

            li, ri, out_valid, total, of3, _cnt = join_ops.inner_join(
                [lkey], lb2.row_valid, [rkey], rb2.row_valid, join_cap)
            from ..executor.device import _gather_col

            jcols = [
                _gather_col(c, li, out_valid) for c in lb2.cols
            ] + [
                _gather_col(c, ri, out_valid) for c in rb2.cols
            ]
            jb = DevBatch(join.schema, jcols, join_cap, out_valid)
            jb = _apply_middle(interp, dp.agg_middle, jb)

            overflow = (of1 | of2 | of3.astype(jnp.int32)).astype(jnp.int32)
            overflow = jax.lax.pmax(overflow, AXIS)

            # second shuffle by the first group key, then local aggregation
            key_pairs = []
            for g in agg.group_exprs:
                d, v, _ = interp.eval_expr(g, jb)
                key_pairs.append(key_code(d, v, _np_kind(g.dtype)))
            payload = []
            payload_valid = []
            for a in agg.aggs:
                if a.arg is None:
                    continue
                d, v, _ = interp.eval_expr(a.arg, jb)
                payload.append(d)
                payload_valid.append(v)
            ship = []
            for code, null in key_pairs:
                ship += [code, null]
            for d, v in zip(payload, payload_valid):
                ship.append(d)
                ship.append(v if v is not None else jnp.ones(d.shape[0], bool))
            part2 = _partition_key(key_pairs[0])
            rk2, shipped2, rvalid2, of4 = shuffle_rows_local(
                part2, ship, jb.row_valid, ndev, regroup_cap)
            overflow = jnp.maximum(overflow, jax.lax.pmax(of4.astype(jnp.int32), AXIS))
            it = iter(shipped2)
            keys2 = []
            for _g in agg.group_exprs:
                c2 = next(it)
                n2 = next(it).astype(bool)
                keys2.append((c2, n2))
            specs = []
            for a in agg.aggs:
                if a.arg is None:
                    specs.append({"func": a.func, "values": None, "valid": None,
                                  "distinct": False,
                                  "acc_dtype": a.out_dtype.numpy_dtype})
                    continue
                vals = next(it)
                valid = next(it).astype(bool)
                specs.append({"func": a.func, "values": vals, "valid": valid,
                              "distinct": False,
                              "acc_dtype": a.out_dtype.numpy_dtype})
            group_codes, results, n_groups, _of = agg_ops.groupby_aggregate(
                keys2, rvalid2, specs, max_groups, n_rows=rk2.shape[0])
            gvalid = jnp.arange(max_groups) < n_groups
            return (
                tuple((c, n) for c, n in group_codes),
                tuple((r[0],
                       r[1] if r[1] is not None else jnp.ones(max_groups, bool))
                      for r in results),
                gvalid,
                overflow.reshape(1),
            )

        if not agg.group_exprs:
            raise NotDistributable("distributed join + global aggregate "
                                   "(group keys required)")

        def flatten(arrays):
            flat = []
            for d, v in arrays:
                flat.append(d)
                flat.append(v if v is not None else
                            jax.device_put(np.zeros(0, dtype=bool),
                                           row_sharding(self.mesh)))
            return flat

        gkeys, gresults, gvalid, overflow = jax.jit(program)(
            l_rowmask, r_rowmask, *flatten(l_arrays), *flatten(r_arrays))
        if int(np.asarray(overflow)[0]):
            raise NotDistributable(
                "distributed join capacities overflowed (data skew); "
                "falling back to single-device execution")
        return _gather_groups(agg, gkeys, gresults, gvalid)


def _partition_key(key_pair):
    code, null = key_pair
    if code.dtype == jnp.float64:
        # consistent (not necessarily collision-free) int mapping for hashing
        scaled = jnp.where(jnp.abs(code) < 1e15, code * 4096.0, code)
        icode = scaled.astype(jnp.int64)
    else:
        icode = code
    return jnp.where(null, jnp.int64(-1), icode)


def _apply_middle(interp, middle, batch):
    from ..executor.device import DevBatch, DevCol
    from ..ops import filter as filter_ops

    for op in middle:
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
    return batch


def _gather_groups(agg: P.TpuAggregate, gkeys, gresults, gvalid) -> ColumnBatch:
    from ..executor.device import _decode_key

    valid = np.asarray(gvalid)
    idx = np.nonzero(valid)[0]
    cols: List[Column] = []
    for (code, null), g in zip(gkeys, agg.group_exprs):
        dc = _decode_key(jnp.asarray(np.asarray(code)),
                         jnp.asarray(np.asarray(null)), g.dtype, None)
        cols.append(Column(np.asarray(dc.data)[idx],
                           None if dc.validity is None
                           else np.asarray(dc.validity)[idx]))
    for (data, has), a in zip(gresults, agg.aggs):
        d = np.asarray(data)[idx]
        h = np.asarray(has)[idx]
        v = None if h.all() else h
        if a.func == "count":
            v = None
        cols.append(Column(d, v))
    return ColumnBatch(agg.schema, cols, len(idx))


def _split_above_aggregate(plan: P.PhysicalPlan) -> Tuple[_DistPlan, bool]:
    """Find the aggregate subtree; report whether operators sit above it."""
    if isinstance(plan, P.TpuAggregate):
        return match_distributable(plan), False
    node = plan
    seen_above = False
    while True:
        if isinstance(node, P.TpuAggregate):
            return match_distributable(node), True
        kids = node.inputs()
        if len(kids) != 1:
            raise NotDistributable(type(node).__name__)
        seen_above = True
        node = kids[0]
