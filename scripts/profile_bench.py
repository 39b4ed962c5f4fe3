"""Profile one bench config under jax.profiler and print device-time report.

Usage: python scripts/profile_bench.py {filter|agg|join|sort} [--rows N]

Runs the same query shapes as bench.py, captures an xplane trace of one
steady-state execution, and prints per-module + per-op device durations.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "filter"
    import jax
    jax.config.update("jax_enable_x64", True)
    import pyarrow as pa

    from igloo_tpu import QueryEngine
    from scripts.xplane import print_report

    eng = QueryEngine(result_cache=False)
    rng = np.random.default_rng(0)

    if which == "filter":
        n = 1 << 26
        eng.register_table("people", pa.table({
            "age": pa.array(rng.integers(0, 100, n), type=pa.int32()),
            "name": pa.array(rng.integers(0, 100_000, n), type=pa.int32()),
        }))
        sql = "SELECT name FROM people WHERE age > 25"
    elif which == "agg":
        n = 100_000_000
        eng.register_table("events", pa.table({
            "k": pa.array(rng.integers(0, 256, n), type=pa.int32()),
            "v": pa.array(rng.integers(0, 1000, n), type=pa.int32()),
        }))
        sql = "SELECT k, sum(v) AS s, count(*) AS c FROM events GROUP BY k"
    elif which == "join":
        n, ndim = 1 << 24, 1 << 15
        eng.register_table("lineitem", pa.table({
            "okey": pa.array(rng.integers(0, ndim, n), type=pa.int32()),
            "qty": pa.array(rng.integers(1, 50, n), type=pa.int32()),
        }))
        eng.register_table("orders", pa.table({
            "okey": pa.array(np.arange(ndim), type=pa.int32()),
            "prio": pa.array(rng.integers(0, 5, ndim), type=pa.int32()),
        }))
        sql = ("SELECT sum(qty) AS s FROM lineitem JOIN orders "
               "ON lineitem.okey = orders.okey WHERE prio < 3")
    elif which == "sort":
        n = 1 << 25
        eng.register_table("keys64", pa.table({
            "k": pa.array(rng.integers(0, 1 << 62, n), type=pa.int64()),
        }))
        sql = "SELECT k FROM keys64 ORDER BY k LIMIT 1000"
    else:
        raise SystemExit(f"unknown config {which}")

    print(f"[profile] warm-up: {sql}", file=sys.stderr)
    eng.sql(sql)          # compile
    eng.sql(sql)          # steady state
    trace_dir = f"/tmp/igloo_prof_{which}"
    import jax.profiler
    with jax.profiler.trace(trace_dir):
        eng.sql(sql)
        jax.effects_barrier()
    print_report(trace_dir)


if __name__ == "__main__":
    main()
