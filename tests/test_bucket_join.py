"""Hash-bucket join path (exec/join_exec.py _bucket_join) vs a Python
join oracle.

Sparse 64-bit keys defeat the dense direct-address planner, so these
queries all take the bucket path: candidate-window probes (K = 1/2/4/8),
the expansion fallback with per-slot verification, and the verified
LEFT/SEMI/ANTI semantics that the classic path restricted for
multi-column >64-bit keys.

Reference semantics anchor: HashJoinExec build/probe
(/root/reference/crates/engine/src/operators/hash_join.rs:100-213),
with correct unmatched-row emission.
"""

import numpy as np
import pyarrow as pa
import pytest


SPARSE = 1_000_003_917  # multiplier keeping keys sparse (span >> 2^24)


def _tables(seed, n_probe=700, n_build=600, dup_build=False,
            with_nulls=True):
    rng = np.random.default_rng(seed)
    uni = rng.permutation(2000)[:n_build].astype(np.int64) * SPARSE
    bkeys = uni.copy()
    if dup_build:
        picks = rng.integers(0, n_build, n_build // 3)
        bkeys = np.concatenate([bkeys, uni[picks]])
    pkeys = rng.choice(uni, n_probe).astype(np.int64)
    miss = rng.permutation(2000)[:n_probe // 4].astype(np.int64)
    pkeys[: n_probe // 4] = (miss + 5000) * SPARSE   # absent from build
    rng.shuffle(pkeys)

    pk = pkeys.astype(object)
    bk = bkeys.astype(object)
    if with_nulls:
        pk[rng.integers(0, n_probe, n_probe // 10)] = None
        bk[rng.integers(0, len(bk), len(bk) // 10)] = None

    probe = pa.table({
        "k": pa.array(list(pk), type=pa.int64()),
        "pv": pa.array(rng.integers(0, 1000, n_probe), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(list(bk), type=pa.int64()),
        "bv": pa.array(rng.integers(0, 1000, len(bk)), type=pa.int32()),
    })
    return probe, build


def _oracle_join(probe, build, kind):
    bmap = {}
    for k, bv in zip(probe_col(build, "k"), probe_col(build, "bv")):
        if k is not None:
            bmap.setdefault(k, []).append(bv)
    out = []
    for k, pv in zip(probe_col(probe, "k"), probe_col(probe, "pv")):
        hits = bmap.get(k, []) if k is not None else []
        if hits:
            for bv in hits:
                out.append((k, pv, bv))
        elif kind == "left":
            out.append((k, pv, None))
    return sorted(out, key=lambda r: (r[0] is None, r[0], r[1],
                                      r[2] is None, r[2] or 0))


def probe_col(t, name):
    return t.column(name).to_pylist()


def _run(engine, probe, build, sql):
    engine.register_table("p", probe)
    engine.register_table("b", build)
    return engine.execute(sql)


def _got_rows(out):
    cols = [out.column(i).to_pylist() for i in range(out.num_columns)]
    rows = list(zip(*cols))
    return sorted(rows, key=lambda r: (r[0] is None, r[0], r[1],
                                       r[2] is None, r[2] or 0))


@pytest.mark.parametrize("dup", [False, True])
def test_bucket_inner(engine, dup):
    probe, build = _tables(1, dup_build=dup)
    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p JOIN b ON p.k = b.k")
    assert _got_rows(out) == _oracle_join(probe, build, "inner")


@pytest.mark.parametrize("dup", [False, True])
def test_bucket_left(engine, dup):
    probe, build = _tables(2, dup_build=dup)
    out = _run(engine, probe, build,
               "SELECT p.k, p.pv, b.bv FROM p LEFT JOIN b ON p.k = b.k")
    assert _got_rows(out) == _oracle_join(probe, build, "left")


def test_bucket_semi_anti(engine):
    probe, build = _tables(3)
    bset = {k for k in probe_col(build, "k") if k is not None}
    has_null_b = any(k is None for k in probe_col(build, "k"))

    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k IN (SELECT k FROM b)")
    exp = sorted(pv for k, pv in zip(probe_col(probe, "k"),
                                     probe_col(probe, "pv"))
                 if k is not None and k in bset)
    assert sorted(out.column("pv").to_pylist()) == exp

    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k NOT IN (SELECT k FROM b)")
    if has_null_b:
        exp = []
    else:
        exp = sorted(pv for k, pv in zip(probe_col(probe, "k"),
                                         probe_col(probe, "pv"))
                     if k is not None and k not in bset)
    assert sorted(out.column("pv").to_pylist()) == exp


def test_bucket_anti_no_build_nulls(engine):
    probe, build = _tables(4, with_nulls=False)
    bset = set(probe_col(build, "k"))
    out = _run(engine, probe, build,
               "SELECT pv FROM p WHERE k NOT IN (SELECT k FROM b)")
    exp = sorted(pv for k, pv in zip(probe_col(probe, "k"),
                                     probe_col(probe, "pv"))
                 if k not in bset)
    assert sorted(out.column("pv").to_pylist()) == exp


@pytest.mark.parametrize("kind,sqlkind", [("inner", "JOIN"),
                                          ("left", "LEFT JOIN")])
def test_bucket_multicol_wide_keys(engine, kind, sqlkind):
    """Two sparse int64 key columns (>64 bits together → hashed+verified):
    the classic path only allowed INNER here."""
    rng = np.random.default_rng(7)
    n_b, n_p = 300, 500
    k1 = rng.permutation(1000)[:n_b].astype(np.int64) * SPARSE
    k2 = rng.permutation(1000)[:n_b].astype(np.int64) * (SPARSE + 8)
    bi = rng.integers(0, n_b, n_p)
    pk1, pk2 = k1[bi].copy(), k2[bi].copy()
    pk1[: n_p // 4] += 17   # break some pairs
    build = pa.table({
        "k1": pa.array(k1), "k2": pa.array(k2),
        "bv": pa.array(np.arange(n_b, dtype=np.int32)),
    })
    probe = pa.table({
        "k1": pa.array(pk1), "k2": pa.array(pk2),
        "pv": pa.array(np.arange(n_p, dtype=np.int32)),
    })
    engine.register_table("p", probe)
    engine.register_table("b", build)
    out = engine.execute(
        f"SELECT p.pv, b.bv FROM p {sqlkind} b "
        "ON p.k1 = b.k1 AND p.k2 = b.k2")
    bmap = {(a, b): v for a, b, v in zip(k1, k2, range(n_b))}
    exp = []
    for a, b, pv in zip(pk1, pk2, range(n_p)):
        hit = bmap.get((a, b))
        if hit is not None:
            exp.append((pv, hit))
        elif kind == "left":
            exp.append((pv, None))
    got = sorted(zip(out.column("pv").to_pylist(),
                     out.column("bv").to_pylist()),
                 key=lambda r: (r[0], r[1] is None, r[1] or 0))
    assert got == sorted(exp, key=lambda r: (r[0], r[1] is None, r[1] or 0))


@pytest.mark.parametrize("dup", [False, True])
def test_bucket_right_full(engine, dup):
    probe, build = _tables(11, dup_build=dup)
    out = _run(engine, probe, build,
               "SELECT p.pv, b.k, b.bv FROM p RIGHT JOIN b ON p.k = b.k")
    bmap = {}
    for k, pv in zip(probe_col(probe, "k"), probe_col(probe, "pv")):
        if k is not None:
            bmap.setdefault(k, []).append(pv)
    exp = []
    for k, bv in zip(probe_col(build, "k"), probe_col(build, "bv")):
        hits = bmap.get(k, []) if k is not None else []
        if hits:
            for pv in hits:
                exp.append((pv, k, bv))
        else:
            exp.append((None, k, bv))
    keyf = lambda r: (r[0] is None, r[0] or 0, r[1] is None, r[1] or 0, r[2])
    got = sorted(zip(out.column("pv").to_pylist(),
                     out.column("k").to_pylist(),
                     out.column("bv").to_pylist()), key=keyf)
    assert got == sorted(exp, key=keyf)

    out = _run(engine, probe, build,
               "SELECT p.pv, b.bv FROM p FULL JOIN b ON p.k = b.k")
    n_inner = sum(len(bmap.get(k, [])) for k in probe_col(build, "k")
                  if k is not None)
    n_left_only = sum(1 for k in probe_col(probe, "k")
                      if k is None or k not in
                      {b for b in probe_col(build, "k") if b is not None})
    n_right_only = sum(1 for k in probe_col(build, "k")
                       if k is None or k not in bmap)
    assert out.num_rows == n_inner + n_left_only + n_right_only


def test_bucket_multicol_semi(engine):
    rng = np.random.default_rng(8)
    n = 200
    k1 = rng.permutation(500)[:n].astype(np.int64) * SPARSE
    k2 = rng.permutation(500)[:n].astype(np.int64) * (SPARSE + 8)
    engine.register_table("b", pa.table({"k1": pa.array(k1),
                                         "k2": pa.array(k2)}))
    pk1 = np.concatenate([k1[:50], k1[:50] + 3])
    pk2 = np.concatenate([k2[:50], k2[:50]])
    engine.register_table("p", pa.table({
        "k1": pa.array(pk1), "k2": pa.array(pk2),
        "pv": pa.array(np.arange(100, dtype=np.int32))}))
    out = engine.execute(
        "SELECT pv FROM p WHERE EXISTS "
        "(SELECT 1 FROM b WHERE b.k1 = p.k1 AND b.k2 = p.k2)")
    assert sorted(out.column("pv").to_pylist()) == list(range(50))
