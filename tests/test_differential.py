"""Differential testing: fused fragment execution vs operator-at-a-time.

The engine has two genuinely different execution paths (one compiled
program per distributable subtree vs one program per operator). Running
a query corpus through both on the same randomized tables is a strong
internal consistency oracle — planner, kernels, and fragment compiler
must all agree.
"""

import numpy as np
import pyarrow as pa
import pytest

import igloo_tpu

CORPUS = [
    "SELECT a, b FROM t WHERE a > 40 ORDER BY a, b LIMIT 17",
    "SELECT a % 7 AS g, count(*) AS c, sum(b) AS s FROM t GROUP BY a % 7 ORDER BY g",
    "SELECT g, count(*) AS c, sum(a) AS s, min(b) AS mn, max(b) AS mx, avg(a) AS av "
    "FROM t GROUP BY g ORDER BY g NULLS LAST",
    "SELECT s, count(DISTINCT g) AS dg FROM t GROUP BY s ORDER BY s NULLS LAST",
    "SELECT count(*), sum(a), avg(b), min(a), max(b) FROM t",
    "SELECT count(*) FROM t WHERE n IS NULL",
    "SELECT t.a, d.label FROM t JOIN d ON t.g = d.g WHERE d.label <> 'x' "
    "ORDER BY t.a LIMIT 50",
    "SELECT d.label, count(*) AS c, sum(t.b) AS s FROM t LEFT JOIN d ON t.g = d.g "
    "GROUP BY d.label ORDER BY d.label NULLS LAST",
    "SELECT d.g, count(t.a) AS c FROM d LEFT JOIN t ON d.g = t.g GROUP BY d.g ORDER BY d.g",
    "SELECT t.a FROM t WHERE t.g IN (SELECT g FROM d WHERE label = 'alpha') ORDER BY a",
    "SELECT t.a FROM t WHERE t.g NOT IN (SELECT g FROM d) ORDER BY a",
    "SELECT a, CASE WHEN a > 50 THEN 'hi' WHEN a > 20 THEN 'mid' ELSE 'lo' END AS bucket "
    "FROM t ORDER BY a LIMIT 30",
    "SELECT coalesce(n, -1) AS cn, count(*) AS c FROM t GROUP BY coalesce(n, -1) ORDER BY cn",
    "SELECT upper(s) AS u, count(*) AS c FROM t WHERE s LIKE '%a%' GROUP BY upper(s) ORDER BY u",
    "SELECT a FROM t WHERE a BETWEEN 10 AND 30 AND b * 2 > a ORDER BY a",
    "SELECT DISTINCT g, s FROM t ORDER BY g NULLS LAST, s NULLS LAST",
    "SELECT a FROM t WHERE a > (SELECT avg(a) FROM t) ORDER BY a LIMIT 20",
    "SELECT g FROM t INTERSECT SELECT g FROM d ORDER BY g",
    "SELECT g FROM t EXCEPT SELECT g FROM d ORDER BY g",
    "SELECT a, sum(b) OVER (PARTITION BY g ORDER BY a) AS rs FROM t ORDER BY a LIMIT 40",
    "SELECT a, row_number() OVER (PARTITION BY g ORDER BY b DESC, a) AS rn "
    "FROM t ORDER BY a LIMIT 40",
    "SELECT g, stddev(b) AS sd, var(b) AS vr FROM t WHERE b IS NOT NULL "
    "GROUP BY g ORDER BY g NULLS LAST",
    "WITH big AS (SELECT a, g FROM t WHERE a > 30) "
    "SELECT g, count(*) AS c FROM big GROUP BY g ORDER BY g NULLS LAST",
    "SELECT x.a AS a1, y.a AS a2 FROM t x JOIN t y ON x.a = y.a WHERE x.b < 10 "
    "ORDER BY a1 LIMIT 25",
    "SELECT a, b FROM t WHERE NOT (a < 50 OR b > 25) ORDER BY a, b",
]


def _make_tables(seed: int):
    rng = np.random.default_rng(seed)
    n = 1200
    a = rng.integers(0, 100, n)
    b = rng.integers(0, 50, n)
    g = np.where(rng.random(n) < 0.08, None,
                 rng.integers(0, 12, n)).tolist()
    ncol = np.where(rng.random(n) < 0.3, None, rng.integers(0, 5, n)).tolist()
    s = rng.choice(["alpha", "beta", "gamma", None, "delta"], n,
                   p=[0.3, 0.25, 0.2, 0.05, 0.2]).tolist()
    t = pa.table({
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64()),
        "g": pa.array(g, type=pa.int64()),
        "n": pa.array(ncol, type=pa.int64()),
        "s": pa.array(s, type=pa.string()),
    })
    d = pa.table({
        "g": pa.array(list(range(0, 16, 2)), type=pa.int64()),
        "label": ["alpha", "beta", "x", "gamma", "x", "delta", "eps", "zeta"],
    })
    return t, d


@pytest.fixture(scope="module")
def engines():
    t, d = _make_tables(7)
    fused = igloo_tpu.QueryEngine(result_cache=False, fused=True)
    plain = igloo_tpu.QueryEngine(result_cache=False, fused=False)
    for e in (fused, plain):
        e.register_table("t", t)
        e.register_table("d", d)
    return fused, plain


@pytest.mark.parametrize("q", CORPUS)
def test_fused_matches_operator_at_a_time(engines, q):
    fused, plain = engines
    got = fused.execute(q).to_pydict()
    want = plain.execute(q).to_pydict()
    assert got.keys() == want.keys(), q
    for col in want:
        gv, wv = got[col], want[col]
        assert len(gv) == len(wv), (q, col)
        for x, y in zip(gv, wv):
            if isinstance(y, float) and isinstance(x, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-12), (q, col)
            else:
                assert x == y, (q, col)
