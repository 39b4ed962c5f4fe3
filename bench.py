"""Benchmark harness — BASELINE.json configs on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speed-of-light fraction: measured rows/s divided by the HBM-bandwidth
roofline for the benchmark's byte traffic (BASELINE.json's stated per-chip
performance bar). 1.0 = memory-bandwidth-bound optimum.

Sub-benchmarks (BASELINE.json configs):
  #1 filter+projection      (SELECT name WHERE age > 25 shape, scaled up)
  #2 hash aggregate         (low-cardinality GROUP BY SUM/COUNT)
  #3 hash join              (fact ⋈ dim + post-join filter)
  #4 sort / top-k           (ORDER BY over int64 keys)

The headline metric is the geometric mean of per-config rows/s.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


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

    # ---- config #1: filter + projection ----
    n1 = 1 << 26
    _log("generating filter table")
    eng.register_table("people", pa.table({
        "age": pa.array(rng.integers(0, 100, n1), type=pa.int32()),
        "name": pa.array(rng.integers(0, 100_000, n1), type=pa.int32()),
    }))
    t = _time_query(eng, "SELECT name FROM people WHERE age > 25")
    rows_s = n1 / t
    # traffic: read age(4) + name(4), write compacted name(4) + mask bytes
    roofline = bw / (4 + 4 + 4 + 1)
    results["filter_projection"] = {
        "rows_per_s": rows_s, "seconds": t, "sol": rows_s / roofline}

    # ---- config #2: low-cardinality hash aggregate ----
    n2 = 100_000_000   # BASELINE config #2: 100M rows
    _log("generating aggregate table")
    eng.register_table("events", pa.table({
        "k": pa.array(rng.integers(0, 256, n2), type=pa.int32()),
        "v": pa.array(rng.integers(0, 1000, n2), type=pa.int32()),
    }))
    t = _time_query(
        eng, "SELECT k, sum(v) AS s, count(*) AS c FROM events GROUP BY k")
    rows_s = n2 / t
    roofline = bw / (4 + 4)
    results["hash_aggregate"] = {
        "rows_per_s": rows_s, "seconds": t, "sol": rows_s / roofline}

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
    t = _time_query(
        eng,
        "SELECT sum(qty) AS s FROM lineitem JOIN orders "
        "ON lineitem.okey = orders.okey WHERE prio < 3")
    rows_s = n3 / t
    roofline = bw / (4 + 4 + 4)   # probe-side traffic per row (approx)
    results["hash_join"] = {
        "rows_per_s": rows_s, "seconds": t, "sol": rows_s / roofline}

    # ---- config #4: sort / top-k ----
    n4 = 1 << 25
    _log("generating sort table")
    eng.register_table("keys64", pa.table({
        "k": pa.array(rng.integers(0, 1 << 62, n4), type=pa.int64()),
    }))
    t = _time_query(eng, "SELECT k FROM keys64 ORDER BY k LIMIT 1000")
    rows_s = n4 / t
    roofline = bw / (8 * 2 * 4)   # multi-pass sort traffic estimate
    results["sort_topk"] = {
        "rows_per_s": rows_s, "seconds": t, "sol": rows_s / roofline}

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
                "seconds": round(v["seconds"], 4),
                "speed_of_light_fraction": round(v["sol"], 4)}
            for k, v in results.items()
        },
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
