"""Clustered physical layout (PartitionedTable.cluster_by): the sorted
bitmap-probe join skips its per-query probe-side lax.sort when the probe
table is already sorted by the join key — VERDICT r4 item #1.

Checks: layout round-trip fidelity, pre-sorted probe correctness vs the
oracle (flat 1-device and 8-shard meshes), auto-cluster hint flow, and
that the pre-sorted path is actually taken.
"""

import numpy as np
import pyarrow as pa
import pytest

from igloo_tpu import QueryEngine
from igloo_tpu.parallel.dist_exec import DistFragment


def _tables(seed, n_probe=3000, nd=256, null_keys=True):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, nd, n_probe)
    k[: n_probe // 8] = rng.integers(nd, 2 * nd, n_probe // 8)   # misses
    pk = k.astype(object)
    if null_keys:
        pk[rng.integers(0, n_probe, n_probe // 10)] = None
    probe = pa.table({
        "k": pa.array(list(pk), type=pa.int64()),
        "v": pa.array(rng.integers(0, 100, n_probe), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(np.arange(nd), type=pa.int64()),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    return probe, build


def _oracle_sum(probe, build):
    bset = {kk for kk in probe.column("k").to_pylist() if kk is not None}
    w = {kk: ww for kk, ww in zip(build.column("k").to_pylist(),
                                  build.column("w").to_pylist())}
    s = c = 0
    byw = {}
    for kk, vv in zip(probe.column("k").to_pylist(),
                      probe.column("v").to_pylist()):
        if kk is not None and kk in w:
            s += vv
            c += 1
            cw, sw = byw.get(w[kk], (0, 0))
            byw[w[kk]] = (cw + 1, sw + vv)
    return s, c, byw


@pytest.fixture
def low_gates(monkeypatch):
    monkeypatch.setattr(DistFragment, "DSORT_MIN_ROWS", 1)
    monkeypatch.setattr(QueryEngine, "AUTO_CLUSTER_MIN_ROWS", 1)
    hits = {"presorted": 0, "sorted": 0}
    orig_ps = DistFragment._presorted_probe
    orig_ds = DistFragment._dense_sorted_probe

    def spy_ps(self, *a, **k):
        out = orig_ps(self, *a, **k)
        if out is not None:
            hits["presorted"] += 1
        return out

    def spy_ds(self, *a, **k):
        out = orig_ds(self, *a, **k)
        if out is not None:
            hits["sorted"] += 1
        return out
    monkeypatch.setattr(DistFragment, "_presorted_probe", spy_ps)
    monkeypatch.setattr(DistFragment, "_dense_sorted_probe", spy_ds)
    return hits


def test_cluster_layout_roundtrip(engine):
    """cluster_by keeps exactly the same rows (sorted by key, nulls and
    padding rewritten to the max valid key under the hood)."""
    probe, _ = _tables(1, n_probe=500, null_keys=True)
    engine.register_table("t", probe)
    before = engine.execute("SELECT k, v FROM t")
    engine.cluster_table("t", "k")
    after = engine.execute("SELECT k, v FROM t")

    def rows(t):
        return sorted(zip(t.column(0).to_pylist(), t.column(1).to_pylist()),
                      key=lambda r: (r[0] is None, r[0] or 0, r[1]))
    assert rows(before) == rows(after)
    # non-null keys must come out sorted in physical order
    ks = [x for x in after.column(0).to_pylist() if x is not None]
    pt = engine._ptables["t"]
    assert pt.clustered_by == "k"


def test_presorted_semi_shape(engine, low_gates):
    probe, build = _tables(2)
    engine.register_table("p", probe)
    engine.register_table("b", build)
    engine.cluster_table("p", "k")
    out = engine.execute(
        "SELECT sum(p.v) AS s, count(*) AS c FROM p JOIN b ON p.k = b.k")
    s, c, _ = _oracle_sum(probe, build)
    assert out.column(0).to_pylist() == [s]
    assert out.column(1).to_pylist() == [c]
    assert low_gates["presorted"] >= 1


def test_presorted_packed_value(engine, low_gates):
    """Right value column consumed above the join → byte-window mode."""
    probe, build = _tables(3)
    engine.register_table("p", probe)
    engine.register_table("b", build)
    engine.cluster_table("p", "k")
    out = engine.execute(
        "SELECT w, count(*) AS c, sum(v) AS s FROM p JOIN b "
        "ON p.k = b.k GROUP BY w ORDER BY w")
    _, _, byw = _oracle_sum(probe, build)
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist(),
                   out.column(2).to_pylist()))
    assert got == [(ww, c, s) for ww, (c, s) in sorted(byw.items())]
    assert low_gates["presorted"] >= 1


def test_presorted_with_filter(engine, low_gates):
    """Filters preserve clustered order (selection masks never move
    rows); masked rows probe their clipped slot and stay dead."""
    probe, build = _tables(4)
    engine.register_table("p", probe)
    engine.register_table("b", build)
    engine.cluster_table("p", "k")
    out = engine.execute(
        "SELECT sum(p.v) AS s FROM p JOIN b ON p.k = b.k "
        "WHERE p.v < 50")
    w = {kk for kk in build.column("k").to_pylist()}
    exp = sum(vv for kk, vv in zip(probe.column("k").to_pylist(),
                                   probe.column("v").to_pylist())
              if kk is not None and kk in w and vv < 50)
    assert out.column(0).to_pylist() == [exp]
    assert low_gates["presorted"] >= 1


def test_auto_cluster_after_first_join(engine, low_gates):
    probe, build = _tables(5)
    engine.register_table("p", probe)
    engine.register_table("b", build)
    out1 = engine.execute(
        "SELECT sum(p.v) AS s FROM p JOIN b ON p.k = b.k")
    s, _, _ = _oracle_sum(probe, build)
    assert out1.column(0).to_pylist() == [s]
    # first run sorted the probe in-query and registered the hint
    assert engine._ptables["p"].clustered_by == "k"
    n_ps = low_gates["presorted"]
    out2 = engine.execute(
        "SELECT sum(p.v) AS s2 FROM p JOIN b ON p.k = b.k")
    assert out2.column(0).to_pylist() == [s]
    assert low_gates["presorted"] > n_ps   # repeat skipped the sort


def test_presorted_distributed_mesh(low_gates):
    """8-shard mesh: per-shard clustering + broadcast join."""
    from igloo_tpu.parallel.engine import DistributedQueryEngine
    eng = DistributedQueryEngine()
    probe, build = _tables(6, n_probe=5000)
    eng.register_table("p", probe)
    eng.register_table("b", build)
    eng.partition_table("p", cluster_key="k")
    out = eng.execute(
        "SELECT sum(p.v) AS s, count(*) AS c FROM p JOIN b ON p.k = b.k")
    s, c, _ = _oracle_sum(probe, build)
    assert out.column(0).to_pylist() == [s]
    assert out.column(1).to_pylist() == [c]
    assert low_gates["presorted"] >= 1


def test_cluster_pair64_int64(engine):
    """Paired-int32 int64 key columns cluster via their planes."""
    from igloo_tpu.table import Column, DeviceTable, pad_count
    import jax.numpy as jnp
    from igloo_tpu.dtypes import SqlType
    rng = np.random.default_rng(7)
    n = 1000
    keys = rng.integers(0, 1 << 40, n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int32)
    cap = pad_count(n)
    lo = (keys & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    hi = (keys >> 32).astype(np.int64).astype(np.int32)
    cols = {
        "k": Column(data=jnp.zeros((cap,), jnp.int32).at[:n].set(lo),
                    dtype=SqlType.INT64, validity=None,
                    stats=(int(keys.min()), int(keys.max())),
                    pair_hi=jnp.zeros((cap,), jnp.int32).at[:n].set(hi)),
        "v": Column(data=jnp.zeros((cap,), jnp.int32).at[:n].set(vals),
                    dtype=SqlType.INT32, validity=None),
    }
    engine.register_table("t64", DeviceTable(cols, n))
    engine.cluster_table("t64", "k")
    out = engine.execute("SELECT k, v FROM t64")
    got = sorted(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    exp = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == exp
    # physical order is sorted by key now
    ks = out.column(0).to_pylist()
    assert ks == sorted(ks)


def test_clustered_skew_hybrid(engine, low_gates):
    """Skew (hot/cold hybrid) state + clustered probe: the cold side is
    already key-sorted after the stable compaction, so the hybrid skips
    its lax.sort — results must stay exact (zipf-shaped keys)."""
    rng = np.random.default_rng(8)
    n, nd = 20_000, 1024
    u = np.maximum(rng.random(n), 1e-7)
    k = (np.minimum(u ** -2.0, nd) - 1).astype(np.int64)
    probe = pa.table({
        "k": pa.array(k),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(np.arange(nd)),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    engine.register_table("p", probe)
    engine.register_table("b", build)
    engine.cluster_table("p", "k")
    sql = ("SELECT w, count(*) AS c, sum(v) AS s FROM p JOIN b "
           "ON p.k = b.k GROUP BY w ORDER BY w")
    engine.execute(sql)                      # build the fragment
    frag = engine._last_frag
    frag.dsort_state = "skew"                # force the hybrid variant
    out = engine.execute(sql)
    _, _, byw = _oracle_sum(probe, build)
    got = list(zip(out.column(0).to_pylist(), out.column(1).to_pylist(),
                   out.column(2).to_pylist()))
    assert got == [(ww, c, s) for ww, (c, s) in sorted(byw.items())]


def test_cluster_stride_detection_and_probe(engine, low_gates):
    """Sparse strided surrogate keys (k = base·8): cluster detects the
    power-of-2 stride and the dense probes run in the compressed slot
    space — results must match the oracle exactly, including off-stride
    probe keys (which can never match)."""
    rng = np.random.default_rng(9)
    n, nd = 6000, 512
    k = (rng.integers(0, nd, n) * 8).astype(np.int64)
    probe = pa.table({
        "k": pa.array(k),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    })
    # off-stride BUILD keys can never match an on-stride probe — the
    # scaled build verification must drop them without overflowing
    bk = np.arange(nd) * 8
    bk[::7] += 3
    build = pa.table({
        "k": pa.array(bk),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    engine.register_table("p", probe)
    engine.register_table("b", build)
    engine.cluster_table("p", "k")
    pt = engine._ptables["p"]
    assert pt.cluster_stride >= 8       # 8 (or more if data allows)
    out = engine.execute(
        "SELECT sum(p.v) AS s, count(*) AS c FROM p JOIN b ON p.k = b.k")
    s, c, _ = _oracle_sum(probe, build)
    assert out.column(0).to_pylist() == [s]
    assert out.column(1).to_pylist() == [c]
    out2 = engine.execute(
        "SELECT w, count(*) AS c FROM p JOIN b ON p.k = b.k "
        "GROUP BY w ORDER BY w")
    _, _, byw = _oracle_sum(probe, build)
    got = list(zip(out2.column(0).to_pylist(), out2.column(1).to_pylist()))
    assert got == [(ww, cc) for ww, (cc, _) in sorted(byw.items())]
    assert low_gates["presorted"] >= 1
