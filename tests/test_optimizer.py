"""Optimizer plan-shape tests: join reordering + predicate pushdown.

Shape assertions use engine.explain() (LogicalPlan.tree_str); every
rewrite is also validated for row-level correctness against the same
query on a tiny engine (capacity padding makes results identical either
way). The reference gets these rewrites from DataFusion's optimizer
(SURVEY §1 L0); here they are native rules in plan/optimizer.py.
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def star_engine(engine):
    """A Q5-ish snowflake: big fact, mid dim, small filtered sub-dim
    reachable only through the mid dim."""
    rng = np.random.default_rng(0)
    n_fact, n_ord, n_cust = 40_000, 4_000, 40
    data = {
        "l_okey": rng.integers(0, n_ord, n_fact).astype(np.int32),
        "l_qty": rng.integers(1, 50, n_fact).astype(np.int32),
        "o_okey": np.arange(n_ord, dtype=np.int32),
        "o_ckey": rng.integers(0, n_cust, n_ord).astype(np.int32),
        "c_ckey": np.arange(n_cust, dtype=np.int32),
        "c_seg": rng.integers(0, 5, n_cust).astype(np.int32),
    }
    engine.register_table("lineitem", pa.table(
        {k: pa.array(data[k]) for k in ("l_okey", "l_qty")}))
    engine.register_table("orders", pa.table(
        {k: pa.array(data[k]) for k in ("o_okey", "o_ckey")}))
    engine.register_table("customer", pa.table(
        {k: pa.array(data[k]) for k in ("c_ckey", "c_seg")}))
    engine._star_data = data
    return engine


Q5ISH = (
    "SELECT sum(l_qty) AS s FROM lineitem "
    "JOIN orders ON l_okey = o_okey "
    "JOIN customer ON o_ckey = c_ckey "
    "WHERE c_seg = 1"
)


def test_join_reorder_shape(star_engine):
    plan = star_engine.explain(Q5ISH)
    lines = plan.splitlines()
    # GOO must rebuild the left-deep Join(Join(lineitem, orders), cust)
    # into the bushy Join(lineitem, Join(orders, customer)): the
    # (orders ⋈ σ(customer)) composite (~1.3K rows) is far cheaper to
    # build than probing 40K fact rows twice. Structurally: the fact
    # scan hangs directly off the ROOT join, i.e. the lineitem line
    # comes BEFORE the second Join line in the tree print.
    join_lines = [i for i, ln in enumerate(lines) if "Join" in ln]
    li_line = next(i for i, ln in enumerate(lines) if "lineitem" in ln)
    assert len(join_lines) == 2, plan
    assert li_line < join_lines[1], plan
    # and the filtered customer dim is the inner join's build side
    cu_line = next(i for i, ln in enumerate(lines) if "customer" in ln)
    od_line = next(i for i, ln in enumerate(lines) if "orders" in ln)
    assert join_lines[1] < od_line < cu_line, plan


def test_join_reorder_rows(star_engine):
    out = star_engine.execute(Q5ISH)
    d = star_engine._star_data
    want = int(d["l_qty"][(d["c_seg"][d["o_ckey"][d["l_okey"]]] == 1)].sum())
    assert out.column("s").to_pylist() == [want]


def test_filter_pushes_through_projection(engine):
    engine.register_table("t", pa.table({
        "a": pa.array([1, 2, 3, 4], type=pa.int32()),
        "b": pa.array([10, 20, 30, 40], type=pa.int32()),
    }))
    plan = engine.explain(
        "SELECT * FROM (SELECT a AS x, b AS y FROM t) sub WHERE x > 2")
    lines = plan.splitlines()
    fi = next(i for i, ln in enumerate(lines) if "Filter" in ln)
    # the filter must sit directly on the scan, not above the projection
    assert any("Scan" in ln for ln in lines[fi + 1:]), plan
    assert not any("Projection" in ln for ln in lines[fi + 1:]), plan
    out = engine.execute(
        "SELECT * FROM (SELECT a AS x, b AS y FROM t) sub WHERE x > 2")
    assert out.column("x").to_pylist() == [3, 4]


def test_having_on_group_key_pushes_below_aggregate(engine):
    engine.register_table("ev", pa.table({
        "k": pa.array([1, 1, 2, 2, 3], type=pa.int32()),
        "v": pa.array([5, 6, 7, 8, 9], type=pa.int32()),
    }))
    sql = ("SELECT k, sum(v) AS s FROM ev GROUP BY k "
           "HAVING k < 3 ORDER BY k")
    plan = engine.explain(sql)
    lines = plan.splitlines()
    ai = next(i for i, ln in enumerate(lines) if "Aggregate" in ln)
    assert any("Filter" in ln for ln in lines[ai + 1:]), plan
    out = engine.execute(sql)
    assert list(zip(out.column("k").to_pylist(),
                    out.column("s").to_pylist())) == [(1, 11), (2, 15)]


def test_having_on_aggregate_stays_above(engine):
    engine.register_table("ev2", pa.table({
        "k": pa.array([1, 1, 2], type=pa.int32()),
        "v": pa.array([5, 6, 7], type=pa.int32()),
    }))
    out = engine.execute(
        "SELECT k, sum(v) AS s FROM ev2 GROUP BY k HAVING sum(v) > 10")
    assert out.column("k").to_pylist() == [1]
    assert out.column("s").to_pylist() == [11]


def test_reorder_preserves_outer_join_boundaries(engine):
    """LEFT joins must not participate in the INNER-chain flattening."""
    engine.register_table("f", pa.table({
        "k": pa.array([1, 2, 3], type=pa.int32())}))
    engine.register_table("d1", pa.table({
        "k": pa.array([1, 2], type=pa.int32()),
        "x": pa.array([10, 20], type=pa.int32())}))
    engine.register_table("d2", pa.table({
        "k": pa.array([2, 3], type=pa.int32()),
        "y": pa.array([200, 300], type=pa.int32())}))
    out = engine.execute(
        "SELECT f.k, x, y FROM f "
        "JOIN d1 ON f.k = d1.k "
        "LEFT JOIN d2 ON f.k = d2.k ORDER BY f.k")
    assert list(zip(out.column("k").to_pylist(),
                    out.column("x").to_pylist(),
                    out.column("y").to_pylist())) == [
        (1, 10, None), (2, 20, 200)]


def test_four_way_chain_rows(engine):
    """4-relation chain with edges to different already-joined rels."""
    engine.register_table("fa", pa.table({
        "a": pa.array([1, 2, 3, 4, 5, 6], type=pa.int32()),
        "b": pa.array([1, 1, 2, 2, 3, 3], type=pa.int32())}))
    engine.register_table("db1", pa.table({
        "a": pa.array([1, 2, 3, 4, 5, 6], type=pa.int32()),
        "p": pa.array([9, 8, 7, 6, 5, 4], type=pa.int32())}))
    engine.register_table("db2", pa.table({
        "b": pa.array([1, 2, 3], type=pa.int32()),
        "q": pa.array([100, 200, 300], type=pa.int32())}))
    engine.register_table("db3", pa.table({
        "p": pa.array([4, 5, 6, 7, 8, 9], type=pa.int32()),
        "r": pa.array([0, 1, 0, 1, 0, 1], type=pa.int32())}))
    out = engine.execute(
        "SELECT fa.a, q, r FROM fa "
        "JOIN db1 ON fa.a = db1.a "
        "JOIN db2 ON fa.b = db2.b "
        "JOIN db3 ON db1.p = db3.p "
        "WHERE r = 1 ORDER BY fa.a")
    got = list(zip(out.column("a").to_pylist(),
                   out.column("q").to_pylist(),
                   out.column("r").to_pylist()))
    # by hand: a->p: 1->9,2->8,3->7,4->6,5->5,6->4 ; r=1 for p in {5,7,9}
    # rows: a=1 (p=9, r=1, b=1,q=100), a=3 (p=7, r=1, b=2,q=200),
    #       a=5 (p=5, r=1, b=3,q=300)
    assert got == [(1, 100, 1), (3, 200, 1), (5, 300, 1)]
