"""Parser tests — covers the reference's parser test surface
(``tests/integration_tests.rs:20-61``, ``parser.rs:232-249``) with structural
assertions instead of Debug-string contains."""

import pytest

from gpu_olap_tpu.plan import logical as L
from gpu_olap_tpu.sql.parser import parse_sql
from gpu_olap_tpu.sql.tokenizer import SqlError


def find(plan, cls):
    """All nodes of type cls in the plan tree."""
    out = []

    def walk(p):
        if isinstance(p, cls):
            out.append(p)
        for k in p.inputs():
            walk(k)

    walk(plan)
    return out


def test_parse_simple_select():
    plan = parse_sql("SELECT a, b FROM t WHERE a > 10")
    assert isinstance(plan, L.Projection)
    assert [e.name() for e in plan.exprs] == ["a", "b"]
    assert isinstance(plan.input, L.Filter)
    assert isinstance(plan.input.input, L.TableScan)
    assert plan.input.input.table_name == "t"


def test_parse_aggregate_extraction():
    plan = parse_sql("SELECT sum(revenue), count(id) FROM orders GROUP BY region")
    aggs = find(plan, L.Aggregate)
    assert len(aggs) == 1
    agg = aggs[0]
    assert [g.name() for g in agg.group_by] == ["region"]
    # the reference leaves aggr_exprs empty (TODO parser.rs:89); we extract them
    assert [a.name() for a in agg.aggr_exprs] == ["sum(revenue)", "count(id)"]


def test_parse_order_by_limit():
    plan = parse_sql("SELECT a FROM t ORDER BY a DESC LIMIT 100")
    assert isinstance(plan, L.Limit) and plan.limit == 100
    assert isinstance(plan.input, L.Sort)
    assert plan.input.keys[0].ascending is False


def test_parse_join():
    plan = parse_sql("SELECT t1.id, t2.val FROM t1 JOIN t2 ON t1.id = t2.id")
    joins = find(plan, L.Join)
    assert len(joins) == 1
    assert joins[0].join_type == "inner"
    assert joins[0].on.name() == "t1.id = t2.id"


def test_parse_join_types():
    for sql_jt, jt in [("LEFT JOIN", "left"), ("LEFT OUTER JOIN", "left"),
                       ("RIGHT JOIN", "right"), ("FULL OUTER JOIN", "full"),
                       ("INNER JOIN", "inner")]:
        plan = parse_sql(f"SELECT a FROM t1 {sql_jt} t2 ON t1.k = t2.k")
        assert find(plan, L.Join)[0].join_type == jt


def test_parse_multi_join_chain():
    plan = parse_sql(
        "SELECT a FROM t1 JOIN t2 ON t1.k = t2.k JOIN t3 ON t2.j = t3.j"
    )
    assert len(find(plan, L.Join)) == 2


def test_parse_having_uses_alias():
    plan = parse_sql(
        "SELECT region, sum(x) AS s FROM t GROUP BY region HAVING s > 10"
    )
    filters = find(plan, L.Filter)
    assert len(filters) == 1
    # HAVING predicate references the aggregate output
    assert "sum(x)" in filters[0].predicate.name()


def test_parse_count_distinct():
    plan = parse_sql("SELECT COUNT(DISTINCT x) FROM t GROUP BY g")
    agg = find(plan, L.Aggregate)[0]
    assert agg.aggr_exprs[0].distinct is True


def test_parse_expressions():
    plan = parse_sql(
        "SELECT a FROM t WHERE a BETWEEN 1 AND 10 AND b IN (1, 2, 3) "
        "AND c IS NOT NULL AND NOT d = 4 AND e LIKE 'x%'"
    )
    pred = find(plan, L.Filter)[0].predicate
    text = pred.name()
    assert "BETWEEN" in text and "IN" in text and "IS NOT NULL" in text


def test_parse_case_cast():
    plan = parse_sql(
        "SELECT CASE WHEN a > 0 THEN 1 ELSE 0 END AS sign, CAST(a AS float) FROM t"
    )
    proj = plan
    assert isinstance(proj, L.Projection)
    assert isinstance(L.strip_alias(proj.exprs[0]), L.Case)
    assert isinstance(proj.exprs[1], L.Cast)


def test_parse_derived_table():
    plan = parse_sql("SELECT r.x FROM (SELECT a AS x FROM t) r")
    subs = find(plan, L.SubqueryAlias)
    assert len(subs) == 1 and subs[0].alias == "r"


def test_parse_distinct():
    plan = parse_sql("SELECT DISTINCT a FROM t")
    assert find(plan, L.Distinct)


def test_parse_order_by_ordinal():
    plan = parse_sql("SELECT a, b FROM t ORDER BY 2 DESC")
    sort = find(plan, L.Sort)[0]
    assert sort.keys[0].expr.name() == "b"


def test_parse_string_literals_and_comments():
    plan = parse_sql(
        "SELECT a FROM t -- line comment\n WHERE s = 'it''s' /* block */ AND b > 0"
    )
    assert find(plan, L.Filter)


def test_parse_errors():
    with pytest.raises(SqlError):
        parse_sql("SELECT FROM t")
    with pytest.raises(SqlError):
        parse_sql("SELECT a FROM t WHERE")
    with pytest.raises(SqlError):
        parse_sql("SELECT a t")  # garbage
    with pytest.raises(SqlError):
        parse_sql("SELECT a FROM t LIMIT xyz")


def test_parse_qualified_star():
    plan = parse_sql("SELECT l.*, r.v FROM a l JOIN b r ON l.k = r.k")
    assert isinstance(plan, L.Projection)
    star = plan.exprs[0]
    assert isinstance(star, L.Star) and star.qualifier == "l"


def test_with_cte_basic():
    plan = parse_sql(
        "WITH t AS (SELECT a FROM base) SELECT t.a FROM t WHERE t.a > 1")
    s = str(plan)
    assert "SubqueryAlias" in s or "t" in s


def test_with_cte_chained_and_join():
    plan = parse_sql(
        "WITH a AS (SELECT x FROM base), b AS (SELECT x FROM a) "
        "SELECT b.x FROM b JOIN a ON b.x = a.x")
    assert plan is not None


def test_with_cte_scoping_error():
    import pytest

    from gpu_olap_tpu.sql.tokenizer import SqlError

    with pytest.raises(SqlError):
        parse_sql("WITH a AS SELECT x FROM t SELECT * FROM a")  # missing parens
