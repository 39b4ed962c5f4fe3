"""TPC-H-shaped correctness: benchmark query shapes vs pandas-computed truth.

BASELINE.json config #3 is lineitem ⋈ orders + post-join filter; this
suite generates a small scale-factor synthetic TPC-H subset and checks
row parity against pandas for the benchmark query shapes (Q1/Q3/Q5/Q6-
like), including dates, strings, multi-way joins and grouped aggregates.
"""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

N_LINEITEM = 6000
N_ORDERS = 1500
N_CUST = 150


@pytest.fixture()
def tpch(engine):
    rng = np.random.default_rng(19920624)
    epoch = datetime.date(1970, 1, 1)

    def days(lo, hi, n):
        return rng.integers((datetime.date(*lo) - epoch).days,
                            (datetime.date(*hi) - epoch).days, n).astype(np.int32)

    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, N_ORDERS + 1), type=pa.int32()),
        "o_custkey": pa.array(rng.integers(1, N_CUST + 1, N_ORDERS), type=pa.int32()),
        "o_orderdate": pa.array(days((1992, 1, 1), (1998, 8, 2), N_ORDERS),
                                type=pa.date32()),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"], N_ORDERS)),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(rng.integers(1, N_ORDERS + 1, N_LINEITEM),
                               type=pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, N_LINEITEM), type=pa.int64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, N_LINEITEM), 2), type=pa.float64()),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, N_LINEITEM), 2),
                               type=pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, N_LINEITEM), 2),
                          type=pa.float64()),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], N_LINEITEM)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], N_LINEITEM)),
        "l_shipdate": pa.array(days((1992, 1, 2), (1998, 12, 1), N_LINEITEM),
                               type=pa.date32()),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(1, N_CUST + 1), type=pa.int32()),
        "c_mktsegment": pa.array(
            rng.choice(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                        "MACHINERY"], N_CUST)),
    })
    engine.register_table("lineitem", lineitem)
    engine.register_table("orders", orders)
    engine.register_table("customer", customer)
    return (engine, lineitem.to_pandas(), orders.to_pandas(),
            customer.to_pandas())


def assert_frame_close(got: pa.Table, want: pd.DataFrame):
    got_df = got.to_pandas()
    assert list(got_df.columns) == list(want.columns)
    assert len(got_df) == len(want), (len(got_df), len(want))
    for c in want.columns:
        g, w = got_df[c].to_numpy(), want[c].to_numpy()
        if w.dtype.kind == "f":
            np.testing.assert_allclose(g.astype(float), w, rtol=1e-9, atol=1e-9)
        else:
            assert (g == w).all(), c


def test_q1_pricing_summary(tpch):
    eng, li, _, _ = tpch
    out = eng.execute("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)
    f = li[li.l_shipdate <= datetime.date(1998, 9, 2)].copy()
    f["disc_price"] = f.l_extendedprice * (1 - f.l_discount)
    f["charge"] = f.disc_price * (1 + f.l_tax)
    want = (f.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("l_quantity", "sum"),
                 sum_base_price=("l_extendedprice", "sum"),
                 sum_disc_price=("disc_price", "sum"),
                 sum_charge=("charge", "sum"),
                 avg_qty=("l_quantity", "mean"),
                 avg_price=("l_extendedprice", "mean"),
                 avg_disc=("l_discount", "mean"),
                 count_order=("l_quantity", "size"))
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    want.insert(0, "l_linestatus", want.pop("l_linestatus"))
    want.insert(0, "l_returnflag", want.pop("l_returnflag"))
    want["count_order"] = want["count_order"].astype(np.int64)
    assert_frame_close(out, want)


def test_q6_forecast_revenue(tpch):
    eng, li, _, _ = tpch
    out = eng.execute("""
        SELECT sum(l_extendedprice * l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """)
    f = li[(li.l_shipdate >= datetime.date(1994, 1, 1))
           & (li.l_shipdate < datetime.date(1995, 1, 1))
           & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
           & (li.l_quantity < 24)]
    want = (f.l_extendedprice * f.l_discount).sum()
    got = out.column("revenue")[0].as_py()
    assert abs(got - want) < 1e-6


def test_config3_join_shape(tpch):
    # BASELINE config #3: lineitem ⋈ orders + post-join filter
    eng, li, od, _ = tpch
    out = eng.execute("""
        SELECT o_orderpriority, count(*) AS c, sum(l_quantity) AS q
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= '1995-01-01'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    m = m[m.o_orderdate >= datetime.date(1995, 1, 1)]
    want = (m.groupby("o_orderpriority", as_index=False)
            .agg(c=("l_quantity", "size"), q=("l_quantity", "sum"))
            .sort_values("o_orderpriority").reset_index(drop=True))
    want["c"] = want["c"].astype(np.int64)
    assert_frame_close(out, want)


def test_q3_shipping_priority(tpch):
    eng, li, od, cu = tpch
    out = eng.execute("""
        SELECT l_orderkey,
               sum(l_extendedprice * (1 - l_discount)) AS revenue,
               o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """)
    m = (cu[cu.c_mktsegment == "BUILDING"]
         .merge(od, left_on="c_custkey", right_on="o_custkey")
         .merge(li, left_on="o_orderkey", right_on="l_orderkey"))
    m = m[(m.o_orderdate < datetime.date(1995, 3, 15))
          & (m.l_shipdate > datetime.date(1995, 3, 15))]
    m["revenue"] = m.l_extendedprice * (1 - m.l_discount)
    want = (m.groupby(["l_orderkey", "o_orderdate"], as_index=False)
            .agg(revenue=("revenue", "sum")))
    want = want[["l_orderkey", "revenue", "o_orderdate"]]
    want = (want.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                             ascending=[False, True, True])
            .head(10).reset_index(drop=True))
    assert_frame_close(out, want)
