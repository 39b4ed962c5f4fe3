"""Differential guard: every dense-join execution path must produce the
same rows on the same randomized inputs.

Paths forced via the dist_exec state machine / gates:
  gather   — dense slot-table, one gather per probe (dsort off)
  sorted   — sorted bitmap/byte-window probe
  skew     — hot/cold hybrid with bounded gather fixup
  bucket   — dense disabled entirely (hash-bucket general path)
"""

import numpy as np
import pyarrow as pa
import pytest


def _mk(seed, n=5000, nd=300, skewed=False):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, nd, n)
    if skewed:
        k[: n // 2] = rng.integers(0, 3, n // 2)
        rng.shuffle(k)
    k[: n // 7] = rng.integers(nd, 2 * nd, n // 7)      # misses
    probe = pa.table({
        "k": pa.array(k, type=pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n), type=pa.int32()),
    })
    build = pa.table({
        "k": pa.array(rng.permutation(nd * 2)[:nd], type=pa.int64()),
        "w": pa.array(rng.integers(0, 7, nd), type=pa.int32()),
    })
    return probe, build


def _force(monkeypatch, mode):
    from igloo_tpu.parallel.dist_exec import DistFragment
    monkeypatch.setattr(DistFragment, "DSORT_MIN_ROWS", 1)
    orig = DistFragment.__init__

    def init(self, *a, **kw):
        orig(self, *a, **kw)
        if mode == "gather":
            self.dsort_state = "off"
        elif mode == "skew":
            self.dsort_state = "skew"
        elif mode == "bucket":
            self.dense_disabled = True
            self.dsort_state = "off"
    monkeypatch.setattr(DistFragment, "__init__", init)


QUERIES = [
    "SELECT p.k, p.v, b.w FROM p JOIN b ON p.k = b.k",
    "SELECT sum(p.v) AS s, count(*) AS c FROM p JOIN b ON p.k = b.k",
    "SELECT b.w, sum(p.v) AS s FROM p JOIN b ON p.k = b.k "
    "GROUP BY b.w ORDER BY b.w",
    "SELECT p.k, p.v, b.w FROM p LEFT JOIN b ON p.k = b.k",
    "SELECT p.v FROM p WHERE p.k IN (SELECT k FROM b)",
    "SELECT p.v FROM p WHERE p.k NOT IN (SELECT k FROM b)",
]


@pytest.mark.parametrize("skewed", [False, True])
@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_join_paths_agree(qi, skewed, monkeypatch):
    import igloo_tpu
    probe, build = _mk(40 + qi, skewed=skewed)
    results = {}
    for mode in ("gather", "sorted", "skew", "bucket"):
        with pytest.MonkeyPatch.context() as mp:
            if mode != "sorted":
                _force(mp, mode)
            else:
                _force(mp, "sorted")
            eng = igloo_tpu.QueryEngine(result_cache=False)
            eng.register_table("p", probe)
            eng.register_table("b", build)
            out = eng.execute(QUERIES[qi])
            cols = [out.column(i).to_pylist()
                    for i in range(out.num_columns)]
            results[mode] = sorted(
                zip(*cols),
                key=lambda r: tuple((x is None, x or 0) for x in r))
    base = results["gather"]
    for mode, rows in results.items():
        assert rows == base, f"path {mode} disagrees with gather"
