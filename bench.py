"""Benchmark harness — BASELINE.json configs on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speed-of-light fraction: measured rows/s divided by the HBM-bandwidth
roofline for the benchmark's byte traffic (BASELINE.json's stated per-chip
performance bar). 1.0 = memory-bandwidth-bound optimum.

Two timings are reported per config:
  wall    — median wall-clock through the dev tunnel (pays a ~25 ms
            dispatch+sync floor per program; see CLAUDE.md TIMING TRAP)
  device  — TPU-measured busy time of every XLA module the query runs,
            from an xplane profiler trace (trustworthy through the
            tunnel). vs_baseline and the headline geomean use DEVICE
            time: it is what production (no tunnel) pays.

Sub-benchmarks (BASELINE.json configs) and their traffic models (the
roofline denominator, bytes per input row; "+w" = write traffic):
  #1 filter+projection   read age(4)+name(4), +w compacted name(4)
                         and the i8 mask plane(1)          = 13 B/row
  #2 hash aggregate      read k(4)+v(4); group-count output
                         is negligible                     = 8 B/row
  #3 hash join           read okey(4)+qty(4), probe lookups
                         hit VMEM, +w matched-sum partials
                         (negligible); mask plane(4)       = 12 B/row
  #4 sort / top-k        read k(8), threshold scan +w u64
                         candidates (negligible at 0.2%
                         selectivity) — one more full read
                         for the candidate extraction      = 16 B/row

The headline metric is the geometric mean of per-config rows/s (device).
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _device_seconds(trace_dir: str) -> float:
    """Sum of device busy time over every XLA module in the trace."""
    from scripts.xplane import module_times
    return sum(dur for _, dur in module_times(trace_dir)) / 1e6


def _time_device(eng, sql: str) -> float:
    """TPU-measured device time of one steady-state run of `sql`."""
    import jax
    with tempfile.TemporaryDirectory(prefix="igloo_bench_prof_") as td:
        with jax.profiler.trace(td):
            eng.sql(sql)
            jax.effects_barrier()
        return _device_seconds(td)


def _hbm_bandwidth_gbps() -> float:
    """Per-chip HBM bandwidth for roofline (v5e ≈ 819 GB/s)."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "lite" in kind:
        return 819.0
    if "v4" in kind:
        return 1228.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def _time_query(eng, sql: str, iters: int = 5) -> float:
    """Median wall time of the device query (result stays on device)."""
    t0 = time.perf_counter()
    eng.sql(sql)  # warm: trace + compile
    _log(f"warm {time.perf_counter() - t0:.1f}s: {sql[:60]}")
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        eng.sql(sql)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)
    import pyarrow as pa

    from igloo_tpu import QueryEngine

    eng = QueryEngine(result_cache=False)
    rng = np.random.default_rng(0)
    bw = _hbm_bandwidth_gbps() * 1e9

    results = {}

    def run(name: str, sql: str, n_rows: int, bytes_per_row: float) -> None:
        wall = _time_query(eng, sql)
        dev = _time_device(eng, sql)
        roofline = bw / bytes_per_row
        rows_s = n_rows / dev
        results[name] = {
            "rows_per_s": rows_s, "seconds": dev, "wall_seconds": wall,
            "sol": rows_s / roofline}
        _log(f"{name}: device {dev*1e3:.1f}ms wall {wall*1e3:.1f}ms "
             f"sol {rows_s / roofline:.4f}")

    # ---- config #1: filter + projection ----
    n1 = 1 << 26
    _log("generating filter table")
    eng.register_table("people", pa.table({
        "age": pa.array(rng.integers(0, 100, n1), type=pa.int32()),
        "name": pa.array(rng.integers(0, 100_000, n1), type=pa.int32()),
    }))
    run("filter_projection", "SELECT name FROM people WHERE age > 25",
        n1, 13)

    # ---- config #2: low-cardinality hash aggregate ----
    n2 = 100_000_000   # BASELINE config #2: 100M rows
    _log("generating aggregate table")
    eng.register_table("events", pa.table({
        "k": pa.array(rng.integers(0, 256, n2), type=pa.int32()),
        "v": pa.array(rng.integers(0, 1000, n2), type=pa.int32()),
    }))
    run("hash_aggregate",
        "SELECT k, sum(v) AS s, count(*) AS c FROM events GROUP BY k",
        n2, 8)

    # ---- config #3: fact-dim hash join + post-join filter ----
    n3 = 1 << 24
    ndim = 1 << 15
    _log("generating join tables")
    eng.register_table("lineitem", pa.table({
        "okey": pa.array(rng.integers(0, ndim, n3), type=pa.int32()),
        "qty": pa.array(rng.integers(1, 50, n3), type=pa.int32()),
    }))
    eng.register_table("orders", pa.table({
        "okey": pa.array(np.arange(ndim), type=pa.int32()),
        "prio": pa.array(rng.integers(0, 5, ndim), type=pa.int32()),
    }))
    run("hash_join",
        "SELECT sum(qty) AS s FROM lineitem JOIN orders "
        "ON lineitem.okey = orders.okey WHERE prio < 3",
        n3, 12)

    # ---- config #4: sort / top-k ----
    n4 = 1 << 25
    _log("generating sort table")
    eng.register_table("keys64", pa.table({
        "k": pa.array(rng.integers(0, 1 << 62, n4), type=pa.int64()),
    }))
    run("sort_topk", "SELECT k FROM keys64 ORDER BY k LIMIT 1000", n4, 16)

    geo = math.exp(sum(math.log(r["rows_per_s"]) for r in results.values())
                   / len(results))
    geo_sol = math.exp(sum(math.log(max(r["sol"], 1e-9))
                           for r in results.values()) / len(results))

    print(json.dumps({
        "metric": "query_throughput_geomean",
        "value": round(geo),
        "unit": "rows/s/chip",
        "vs_baseline": round(geo_sol, 4),
        "details": {
            k: {"rows_per_s": round(v["rows_per_s"]),
                "device_seconds": round(v["seconds"], 4),
                "wall_seconds": round(v["wall_seconds"], 4),
                "speed_of_light_fraction": round(v["sol"], 4)}
            for k, v in results.items()
        },
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
