"""Sort-based grouped aggregation — the TPU-native hash-aggregate.

The reference's CUDA design is an atomicAdd shared-memory hash table
(``aggregate_kernel.rs:1-8``, ``join_kernels.cuh:216-240``).  TPUs have no such
atomics, so the redesign (SURVEY.md §2.2 checklist) is: lexicographic
``lax.sort`` of the key columns, run-boundary detection, then XLA segment
reductions — exact for multi-column int64/float/string-code keys, null keys
forming their own group, null values skipped (SQL semantics).  Everything is
static-shape: outputs are padded to ``max_groups`` with a returned group count.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402

from .dtypes import INT64_MAX, INT64_MIN  # noqa: E402


def _sort_with_payload(key_ops: List, payloads: List):
    res = jax.lax.sort(tuple(key_ops) + tuple(payloads), num_keys=len(key_ops))
    return res[: len(key_ops)], res[len(key_ops):]


def _segment(values, gid, num_segments, reducer):
    if reducer == "sum":
        return jax.ops.segment_sum(values, gid, num_segments=num_segments)
    if reducer == "min":
        return jax.ops.segment_min(values, gid, num_segments=num_segments)
    if reducer == "max":
        return jax.ops.segment_max(values, gid, num_segments=num_segments)
    raise AssertionError(reducer)


def groupby_aggregate(
    keys: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],  # (int64 code, bool is_null) per key
    row_valid: Optional[jnp.ndarray],                 # bool (N,) or None
    aggs: Sequence[dict],
    max_groups: int,
    n_rows: Optional[int] = None,
):
    """Grouped aggregation over padded columns.

    ``aggs`` entries: {func, values (jnp or None for count(*)), valid (jnp|None),
    distinct (bool), acc_dtype (np dtype)}.

    Returns (group_codes: [(code, null)], agg_results: [(data, valid|None)],
    n_groups: i64 scalar, overflow: bool scalar).
    """
    if keys:
        n = keys[0][0].shape[0]
    elif n_rows is not None:
        n = n_rows
    else:
        first = next(a for a in aggs if a.get("values") is not None)
        n = first["values"].shape[0]
    arange = jnp.arange(n, dtype=jnp.int64)
    row_invalid = (
        jnp.zeros(n, dtype=jnp.int32) if row_valid is None else (~row_valid).astype(jnp.int32)
    )

    if not keys:
        # global aggregate: single group, no sort needed
        nvalid = n - jnp.sum(row_invalid)
        in_prefix = row_invalid == 0  # valid rows anywhere, single group
        gid = jnp.where(in_prefix, 0, 1)
        results = []
        for spec in aggs:
            results.append(
                _agg_one(spec, gid, in_prefix, None, 2, 1, pre_sorted=False)
            )
        return [], results, jnp.asarray(1, dtype=jnp.int64), jnp.asarray(False)

    key_ops: List = [row_invalid]
    for code, null in keys:
        key_ops.append(null.astype(jnp.int32))
        key_ops.append(code)

    sorted_keys, payloads = _sort_with_payload(key_ops, [arange])
    perm = payloads[0]
    nvalid = n - jnp.sum(sorted_keys[0])
    in_prefix = arange < nvalid

    newflag = arange == 0
    for op in sorted_keys[1:]:
        newflag = newflag | jnp.concatenate([jnp.ones(1, dtype=bool), op[1:] != op[:-1]])
    newflag = newflag & in_prefix
    gid_raw = jnp.cumsum(newflag.astype(jnp.int64)) - 1
    n_groups = jnp.sum(newflag.astype(jnp.int64))
    overflow = n_groups > max_groups
    gid = jnp.where(in_prefix, jnp.clip(gid_raw, 0, max_groups), max_groups)
    nseg = max_groups + 1  # +1 drop bucket for invalid rows / overflow

    # group key outputs (all rows in a group share the key: segment_max is exact)
    group_codes = []
    ki = 1
    for _ in keys:
        null_s, code_s = sorted_keys[ki], sorted_keys[ki + 1]
        ki += 2
        from .dtypes import key_fill

        fill = jnp.asarray(key_fill(code_s.dtype), dtype=code_s.dtype)
        out_code = _segment(jnp.where(in_prefix, code_s, fill), gid, nseg, "max")[:max_groups]
        out_null = _segment(jnp.where(in_prefix, null_s, 0), gid, nseg, "max")[:max_groups]
        group_codes.append((out_code, out_null.astype(bool)))

    results = []
    for spec in aggs:
        results.append(
            _agg_one(spec, gid, in_prefix, perm, nseg, max_groups,
                     pre_sorted=True, key_ops=key_ops)
        )
    return group_codes, results, n_groups, overflow


def _agg_one(spec, gid, in_prefix, perm, nseg, out_len, pre_sorted,
             key_ops=None):
    """Compute one aggregate; returns (data[:out_len], valid|None)."""
    func = spec["func"]
    values = spec.get("values")
    valid = spec.get("valid")
    n = gid.shape[0]

    if func == "count" and values is None:
        cnt = jax.ops.segment_sum(in_prefix.astype(jnp.int64), gid, num_segments=nseg)
        return cnt[:out_len], None

    if pre_sorted:
        vals = values[perm]
        v_valid = in_prefix if valid is None else (valid[perm] & in_prefix)
    else:
        vals = values
        v_valid = in_prefix if valid is None else (valid & in_prefix)

    if spec.get("distinct") and func == "count":
        # needs its own sort ordered by (group keys, value) for adjacency dedup
        assert key_ops is not None or not pre_sorted
        from .dtypes import key_code

        vcode, vnull = key_code(values, valid, spec.get("np_kind", "i"))
        if pre_sorted:
            ops = list(key_ops) + [vnull.astype(jnp.int32), vcode]
        else:
            arange0 = jnp.arange(n, dtype=jnp.int64)
            ops = [(~in_prefix).astype(jnp.int32), vnull.astype(jnp.int32), vcode]
        sorted2, _ = _sort_with_payload(ops, [])
        arange = jnp.arange(n, dtype=jnp.int64)
        nvalid2 = n - jnp.sum(sorted2[0])
        in_pref2 = arange < nvalid2
        # group boundary over the *key* operands only
        key_end = len(ops) - 2
        newflag2 = arange == 0
        for op in sorted2[1:key_end]:
            newflag2 = newflag2 | jnp.concatenate([jnp.ones(1, dtype=bool), op[1:] != op[:-1]])
        newflag2 = newflag2 & in_pref2
        gid2_raw = jnp.cumsum(newflag2.astype(jnp.int64)) - 1
        gid2 = jnp.where(in_pref2, jnp.clip(gid2_raw, 0, nseg - 1), nseg - 1)
        # distinct-value boundary within a group
        vnull_s, vcode_s = sorted2[key_end], sorted2[key_end + 1]
        vdiff = jnp.concatenate([jnp.ones(1, dtype=bool), vcode_s[1:] != vcode_s[:-1]])
        distinct_new = (newflag2 | vdiff) & in_pref2 & (vnull_s == 0)
        cnt = jax.ops.segment_sum(distinct_new.astype(jnp.int64), gid2, num_segments=nseg)
        return cnt[:out_len], None

    if func == "count":
        cnt = jax.ops.segment_sum(v_valid.astype(jnp.int64), gid, num_segments=nseg)
        return cnt[:out_len], None

    has_any = jax.ops.segment_max(v_valid.astype(jnp.int32), gid, num_segments=nseg)[:out_len] > 0

    acc_dtype = spec["acc_dtype"]
    if func == "sum":
        acc = jax.ops.segment_sum(
            jnp.where(v_valid, vals.astype(acc_dtype), jnp.asarray(0, acc_dtype)),
            gid, num_segments=nseg,
        )
        return acc[:out_len], has_any
    if func == "avg":
        s = jax.ops.segment_sum(
            jnp.where(v_valid, vals.astype(jnp.float64), 0.0), gid, num_segments=nseg
        )
        c = jax.ops.segment_sum(v_valid.astype(jnp.int64), gid, num_segments=nseg)
        avg = s[:out_len] / jnp.maximum(c[:out_len], 1)
        return jnp.where(c[:out_len] > 0, avg, 0.0), has_any
    if func in ("min", "max"):
        if np.dtype(acc_dtype).kind == "f":
            ident = jnp.inf if func == "min" else -jnp.inf
        else:
            ident = INT64_MAX if func == "min" else INT64_MIN
        masked = jnp.where(v_valid, vals.astype(acc_dtype), jnp.asarray(ident, acc_dtype))
        acc = _segment(masked, gid, nseg, func)[:out_len]
        return jnp.where(has_any, acc, jnp.asarray(0, acc_dtype)), has_any
    raise AssertionError(func)
