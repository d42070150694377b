"""Optimizer tests — reference pass coverage (``optimizer.rs:220-245``,
``integration_tests.rs:67-105``) plus the join-side splitting and real constant
folding the reference never implemented."""

from gpu_olap_tpu.plan import logical as L
from gpu_olap_tpu.plan.optimizer import (
    fold_constants, merge_filters, optimize, pushdown_predicates, split_conjunction,
)
from gpu_olap_tpu.sql.parser import parse_sql


def find(plan, cls):
    out = []

    def walk(p):
        if isinstance(p, cls):
            out.append(p)
        for k in p.inputs():
            walk(k)

    walk(plan)
    return out


def test_predicate_pushdown_below_projection():
    plan = optimize(parse_sql("SELECT a FROM t WHERE a > 5"))
    # Projection(Filter(TableScan)) — filter sits below projection
    assert isinstance(plan, L.Projection)
    assert isinstance(plan.input, L.Filter)
    assert isinstance(plan.input.input, L.TableScan)


def test_merge_filters_and():
    inner = L.Filter(
        L.TableScan("t"),
        L.BinaryOp("<", L.Column("b"), L.Literal(100)),
    )
    plan = L.Filter(inner, L.BinaryOp(">", L.Column("a"), L.Literal(5)))
    merged = merge_filters(plan)
    assert isinstance(merged, L.Filter)
    assert isinstance(merged.input, L.TableScan)
    assert merged.predicate.op == "AND"


def test_join_side_splitting():
    plan = optimize(parse_sql(
        "SELECT o.id FROM orders o JOIN customers c ON o.cid = c.id "
        "WHERE o.amount > 100 AND c.region = 'EU'"
    ))
    join = find(plan, L.Join)[0]
    left_filters = find(join.left, L.Filter)
    right_filters = find(join.right, L.Filter)
    assert len(left_filters) == 1 and "amount" in left_filters[0].predicate.name()
    assert len(right_filters) == 1 and "region" in right_filters[0].predicate.name()
    assert not find(plan, L.Filter)[0:0]  # no filter left above the join
    assert all(f in left_filters + right_filters for f in find(plan, L.Filter))


def test_projection_pushdown_into_scan():
    plan = optimize(parse_sql("SELECT a FROM t WHERE b > 1"))
    scan = find(plan, L.TableScan)[0]
    assert scan.projection is not None
    assert set(scan.projection) == {"a", "b"}


def test_constant_folding():
    plan = fold_constants(parse_sql("SELECT a FROM t WHERE a > 2 + 3 AND 1 = 1"))
    pred = find(plan, L.Filter)[0].predicate
    after = optimize(parse_sql("SELECT a FROM t WHERE a > 2 + 3 AND 1 = 1"))
    pred2 = find(after, L.Filter)[0].predicate
    assert pred2.name() == "a > 5"


def test_constant_folding_or_short_circuit():
    plan = optimize(parse_sql("SELECT a FROM t WHERE a > 1 OR 1 = 1"))
    # OR TRUE -> filter disappears entirely or becomes TRUE
    filters = find(plan, L.Filter)
    assert not filters or filters[0].predicate == L.Literal(True)


def test_no_pushdown_below_limit():
    # filter above a derived table with LIMIT must not move below the limit
    plan = optimize(parse_sql(
        "SELECT x FROM (SELECT a AS x FROM t LIMIT 10) s WHERE x > 5"
    ))
    limits = find(plan, L.Limit)
    assert limits
    # the Filter must NOT be a descendant of the Limit's input
    for lim in limits:
        assert not find(lim.input, L.Filter)


def test_pushdown_through_aggregate_group_keys_only():
    plan = optimize(parse_sql(
        "SELECT region, sum(x) AS s FROM t GROUP BY region HAVING s > 10 AND region = 'EU'"
    ))
    agg = find(plan, L.Aggregate)[0]
    # region = 'EU' can be pushed below the aggregate; s > 10 cannot
    below = find(agg.input, L.Filter)
    assert any("region" in f.predicate.name() for f in below)
    above = [f for f in find(plan, L.Filter) if f not in below]
    assert any("sum(x)" in f.predicate.name() for f in above)


def test_split_conjunction():
    e = parse_sql("SELECT a FROM t WHERE a > 1 AND b < 2 AND c = 3")
    pred = find(e, L.Filter)[0].predicate
    assert len(split_conjunction(pred)) == 3
