"""Dense-unique direct join path (exec/dense_join.py) vs a Python oracle.

Dense integer build keys with ingest stats route fact→dim joins to the
one-gather slot-table path; duplicate build keys must fall back to the
general paths with identical results.
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(params=["host", "dist"])
def dense(monkeypatch, request):
    """Force-enable the dense path at test sizes and count its hits.

    host: the Executor path (exec/dense_join.py), reached by disabling
    fragment compilation. dist: the fused-fragment path
    (dist_exec._dense_local_join) on the 8-device mesh (broadcast join).
    """
    hits = {"n": 0, "route": request.param}
    if request.param == "host":
        from igloo_tpu.exec import dense_join
        from igloo_tpu.parallel import dist_exec
        monkeypatch.setattr(dense_join, "DENSE_MIN_ROWS", 1)
        monkeypatch.setattr(dist_exec, "subtree_distributable",
                            lambda *a, **k: False)
        orig = dense_join.try_dense_direct

        def spy(*a, **k):
            out = orig(*a, **k)
            if out is not None:
                hits["n"] += 1
            return out
        monkeypatch.setattr(dense_join, "try_dense_direct", spy)
    else:
        from igloo_tpu.parallel.dist_exec import DistFragment
        orig = DistFragment._dense_local_join

        def spy(self, *a, **k):
            out = orig(self, *a, **k)
            if out is not None:
                hits["n"] += 1
            return out
        monkeypatch.setattr(DistFragment, "_dense_local_join", spy)
    return hits


def _tables(seed, n_probe=900, n_build=500, dup_build=False,
            null_build_keys=True, null_bv=False, extra_col=False):
    rng = np.random.default_rng(seed)
    uni = rng.permutation(1500)[:n_build].astype(np.int64)
    bkeys = uni.copy()
    if dup_build:
        bkeys = np.concatenate([bkeys, uni[rng.integers(0, n_build, 50)]])
    pkeys = rng.choice(uni, n_probe)
    pkeys[: n_probe // 4] = rng.integers(1500, 3000, n_probe // 4)  # miss
    pkeys[n_probe // 4: n_probe // 3] = -rng.integers(
        1, 500, n_probe // 3 - n_probe // 4)                # out of range
    rng.shuffle(pkeys)

    pk = pkeys.astype(object)
    bk = bkeys.astype(object)
    pk[rng.integers(0, n_probe, n_probe // 10)] = None
    if null_build_keys:
        bk[rng.integers(0, len(bk), len(bk) // 10)] = None

    bv = rng.integers(0, 1000, len(bk)).astype(object)
    if null_bv:
        bv[rng.integers(0, len(bk), len(bk) // 8)] = None
    build_cols = {
        "k": pa.array(list(bk), type=pa.int64()),
        "bv": pa.array(list(bv), type=pa.int32()),
    }
    if extra_col:
        build_cols["bw"] = pa.array(
            rng.integers(0, 7, len(bk)), type=pa.int64())
    probe = pa.table({
        "k": pa.array(list(pk), type=pa.int64()),
        "pv": pa.array(rng.integers(0, 1000, n_probe), type=pa.int32()),
    })
    return probe, pa.table(build_cols)


def _col(t, name):
    return t.column(name).to_pylist()


def _oracle(probe, build, kind, cols=("k", "pv", "bv")):
    bmap = {}
    brows = list(zip(*[_col(build, c) for c in build.column_names]))
    for row in brows:
        if row[0] is not None:
            bmap.setdefault(row[0], []).append(row)
    out = []
    for k, pv in zip(_col(probe, "k"), _col(probe, "pv")):
        hits = bmap.get(k, []) if k is not None else []
        if hits:
            for b in hits:
                out.append(tuple({"k": k, "pv": pv, "bv": b[1],
                                  "bk": b[0],
                                  "bw": b[2] if len(b) > 2 else None}[c]
                                 for c in cols))
        elif kind == "left":
            out.append(tuple({"k": k, "pv": pv, "bv": None, "bk": None,
                              "bw": None}[c] for c in cols))
    return sorted(out, key=_key)


def _key(r):
    return tuple((v is None, v if v is not None else 0) for v in r)


def _rows(out):
    cols = [out.column(i).to_pylist() for i in range(out.num_columns)]
    return sorted(zip(*cols), key=_key)


def _run(engine, probe, build, sql):
    engine.register_table("p", probe)
    engine.register_table("b", build)
    return engine.execute(sql)


def test_dense_inner_packed(engine, dense):
    probe, build = _tables(1)
    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "inner")
    assert dense["n"] == 1


def test_dense_inner_rowtable(engine, dense):
    # two value columns (int32 + int64) → stacked row-table path
    probe, build = _tables(2, extra_col=True)
    out = _run(engine, probe, build,
               "SELECT p.pv, b.bv, b.bw FROM p JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "inner",
                                 cols=("pv", "bv", "bw"))
    assert dense["n"] == 1


def test_dense_inner_null_values(engine, dense):
    probe, build = _tables(3, null_bv=True)
    out = _run(engine, probe, build,
               "SELECT p.pv, b.bv FROM p JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "inner", cols=("pv", "bv"))
    assert dense["n"] == 1


def test_dense_key_reconstruction(engine, dense):
    probe, build = _tables(4)
    out = _run(engine, probe, build,
               "SELECT b.k, p.pv FROM p JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "inner", cols=("bk", "pv"))
    assert dense["n"] == 1


def test_dense_left(engine, dense):
    probe, build = _tables(5)
    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p LEFT JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "left")
    assert dense["n"] == 1


def test_dense_dup_fallback(engine, dense):
    probe, build = _tables(6, dup_build=True)
    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "inner")
    # host: dup keys detected up front → general path, no dense result.
    # dist: dense runs optimistically, trips OVF_DENSE, host retries on
    # the general path — results identical either way.
    if dense["route"] == "host":
        assert dense["n"] == 0

    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p LEFT JOIN b ON p.k = b.k")
    assert _rows(out) == _oracle(probe, build, "left")
    if dense["route"] == "host":
        assert dense["n"] == 0


def test_dense_semi_anti(engine, dense):
    probe, build = _tables(7, null_build_keys=False)
    bset = {k for k in _col(build, "k") if k is not None}

    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k IN (SELECT k FROM b)")
    exp = sorted(pv for k, pv in zip(_col(probe, "k"), _col(probe, "pv"))
                 if k is not None and k in bset)
    assert sorted(out.column(0).to_pylist()) == exp

    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k NOT IN (SELECT k FROM b)")
    exp = sorted(pv for k, pv in zip(_col(probe, "k"), _col(probe, "pv"))
                 if k is not None and k not in bset)
    assert sorted(out.column(0).to_pylist()) == exp
    if dense["route"] == "host":
        assert dense["n"] == 2


def test_dense_anti_null_build(engine, dense):
    probe, build = _tables(8, null_build_keys=True)
    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k NOT IN (SELECT k FROM b)")
    # any NULL build key → NOT IN never true
    assert out.num_rows == 0
    if dense["route"] == "host":
        assert dense["n"] == 1


def test_dense_sorted_semi_shape(engine, dense, monkeypatch):
    """No right column consumed downstream → semi shape → the sorted
    bitmap-probe path (dist route only)."""
    from igloo_tpu.parallel.dist_exec import DistFragment
    monkeypatch.setattr(DistFragment, "DSORT_MIN_ROWS", 1)
    hits = {"n": 0}
    orig = DistFragment._dense_sorted_probe

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        if out is not None:
            hits["n"] += 1
        return out
    monkeypatch.setattr(DistFragment, "_dense_sorted_probe", spy)

    probe, build = _tables(12)
    out = _run(engine, probe, build,
               "SELECT sum(p.pv) AS s FROM p JOIN b ON p.k = b.k")
    exp = sum(pv for _, pv, _ in _oracle(probe, build, "inner"))
    assert out.column(0).to_pylist() == [exp]
    if dense["route"] == "dist":
        assert hits["n"] == 1

    # key column in the output is reconstructible → still semi shape
    out = _run(engine, probe, build,
               "SELECT b.k, count(*) AS c FROM p JOIN b ON p.k = b.k "
               "GROUP BY b.k ORDER BY b.k")
    exp2: dict = {}
    for k, _, _ in _oracle(probe, build, "inner"):
        exp2[k] = exp2.get(k, 0) + 1
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    assert got == sorted(exp2.items())


def test_dense_sorted_value_mode(engine, dense, monkeypatch):
    """Single packed small-range value column → the byte-window sorted
    path (zipf config shape): join + GROUP BY on the joined value."""
    from igloo_tpu.parallel.dist_exec import DistFragment
    monkeypatch.setattr(DistFragment, "DSORT_MIN_ROWS", 1)
    rng = np.random.default_rng(21)
    n, nd = 3000, 64
    probe = pa.table({
        "k": pa.array(rng.integers(0, nd, n), type=pa.int32()),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(np.arange(nd), type=pa.int32()),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    out = _run(engine, probe, build,
               "SELECT w, count(*) AS c, sum(v) AS s FROM p JOIN b "
               "ON p.k = b.k GROUP BY w ORDER BY w")
    k = np.asarray(probe.column("k")); v = np.asarray(probe.column("v"))
    w = np.asarray(build.column("w"))
    exp = {}
    for kk, vv in zip(k, v):
        ww = int(w[kk])
        c0, s0 = exp.get(ww, (0, 0))
        exp[ww] = (c0 + 1, s0 + int(vv))
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist(),
                   out.column(2).to_pylist()))
    assert got == [(ww, c, s) for ww, (c, s) in sorted(exp.items())]


def test_dense_skew_hybrid(engine, dense, monkeypatch):
    """Forced 'skew' state: hot keys answer via vectorized compares,
    cold minority via compact+sort+window — results identical."""
    from igloo_tpu.parallel.dist_exec import DistFragment
    monkeypatch.setattr(DistFragment, "DSORT_MIN_ROWS", 1)
    orig_init = DistFragment.__init__

    def init(self, *a, **k):
        orig_init(self, *a, **k)
        self.dsort_state = "skew"
    monkeypatch.setattr(DistFragment, "__init__", init)

    rng = np.random.default_rng(31)
    n, nd = 4000, 256
    # zipf-ish: half the rows hit 4 hot keys
    k = rng.integers(0, nd, n)
    k[: n // 2] = rng.integers(0, 4, n // 2)
    rng.shuffle(k)
    k[: n // 8] = rng.integers(nd, 2 * nd, n // 8)       # misses
    probe = pa.table({
        "k": pa.array(k, type=pa.int32()),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(np.arange(nd), type=pa.int32()),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    out = _run(engine, probe, build,
               "SELECT w, count(*) AS c, sum(v) AS s FROM p JOIN b "
               "ON p.k = b.k GROUP BY w ORDER BY w")
    v = np.asarray(probe.column("k")), np.asarray(probe.column("v"))
    w = np.asarray(build.column("w"))
    exp = {}
    for kk, vv in zip(*v):
        if kk < nd:
            ww = int(w[kk])
            c0, s0 = exp.get(ww, (0, 0))
            exp[ww] = (c0 + 1, s0 + int(vv))
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist(),
                   out.column(2).to_pylist()))
    assert got == [(ww, c, s) for ww, (c, s) in sorted(exp.items())]

    # semi shape (presence bits) under skew
    out = _run(engine, probe, build,
               "SELECT sum(p.v) AS s FROM p JOIN b ON p.k = b.k")
    exp_s = sum(int(vv) for kk, vv in zip(*v) if kk < nd)
    assert out.column(0).to_pylist() == [exp_s]


def test_dense_case_over_join_column(engine, dense):
    """Regression (round-4 advisor, high): a join column read ONLY inside
    a CASE arm must count as needed — BCase.whens nests exprs two levels
    deep ((cond, value), ...), which a one-level _expr_refs walk missed,
    pruning the live right column to a zero placeholder."""
    probe, build = _tables(10, extra_col=True)
    out = _run(engine, probe, build,
               "SELECT sum(CASE WHEN b.bw > 2 THEN 1 ELSE 0 END) AS s "
               "FROM p JOIN b ON p.k = b.k")
    exp = sum(1 if (bw is not None and bw > 2) else 0
              for _, _, bw in _oracle(probe, build, "inner",
                                      cols=("pv", "bv", "bw")))
    assert out.column(0).to_pylist() == [exp]

    # CASE value arm reading the join column (not just the condition)
    out = _run(engine, probe, build,
               "SELECT sum(CASE WHEN p.pv >= 0 THEN b.bw ELSE 0 END) AS s "
               "FROM p JOIN b ON p.k = b.k")
    exp = sum(bw for _, _, bw in _oracle(probe, build, "inner",
                                         cols=("pv", "bv", "bw"))
              if bw is not None)
    assert out.column(0).to_pylist() == [exp]


def test_dense_join_then_agg(engine, dense):
    probe, build = _tables(9, extra_col=True)
    out = _run(engine, probe, build,
               "SELECT b.bw, sum(p.pv) AS s FROM p JOIN b ON p.k = b.k "
               "GROUP BY b.bw ORDER BY b.bw")
    exp = {}
    for pv, bv, bw in _oracle(probe, build, "inner",
                              cols=("pv", "bv", "bw")):
        exp[bw] = exp.get(bw, 0) + pv
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    assert got == sorted(exp.items())
    assert dense["n"] == 1
