"""Sibling fragments dispatch concurrently (engine._substitute_fragments
pass 2) — ≙ the reference's ready-fragment wave scheduler
(distributed_executor.rs:49-182), minus its per-wave barrier."""

import threading
import time

import numpy as np
import pyarrow as pa


def test_union_branches_run_concurrently(engine, monkeypatch):
    rng = np.random.default_rng(11)
    for name in ("ta", "tb"):
        engine.register_table(name, pa.table({
            "k": pa.array(rng.integers(0, 8, 4000), type=pa.int32()),
            "v": pa.array(rng.integers(0, 100, 4000), type=pa.int32()),
        }))

    state = {"cur": 0, "peak": 0}
    lock = threading.Lock()
    orig = type(engine)._run_fragment

    def spy(self, plan):
        with lock:
            state["cur"] += 1
            state["peak"] = max(state["peak"], state["cur"])
        time.sleep(0.05)     # widen the overlap window
        try:
            return orig(self, plan)
        finally:
            with lock:
                state["cur"] -= 1
    monkeypatch.setattr(type(engine), "_run_fragment", spy)

    out = engine.execute(
        "SELECT k, sum(v) AS s FROM ta GROUP BY k "
        "UNION ALL SELECT k, sum(v) AS s FROM tb GROUP BY k")

    def oracle(name):
        t = engine.catalog.get_table(name).to_arrow()
        k = np.asarray(t.column("k")); v = np.asarray(t.column("v"))
        return {kk: int(v[k == kk].sum()) for kk in np.unique(k)}

    exp = sorted(list(oracle("ta").items()) + list(oracle("tb").items()))
    got = sorted(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    assert got == exp
    assert state["peak"] >= 2, f"fragments ran serially: {state}"
