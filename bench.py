"""Benchmark harness — BASELINE.json configs on one chip, honest shapes.

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

All benchmark tables are generated ON DEVICE (splitmix64 over iota) and
registered as DeviceTables: the axon tunnel's host->device bandwidth is
erratic (minutes for 100M-row transfers on bad days) and none of it is
part of what is being measured. Each config's tables are DROPped before
the next so peak HBM = one config's working set (the 1B-row sort alone
needs ~13 GB of the 16 GB chip).

Sub-benchmarks (BASELINE.json configs) and their traffic models (the
roofline denominator, bytes per input row; "+w" = write traffic):
  #1 filter+projection   read age(4)+name(4), +w compacted name(4)
                         and the i8 mask plane(1)          = 13 B/row
  #2 hash aggregate      read k(4)+v(4)+alive i8(1); group
                         output negligible                 = 9 B/row
  #3 hash join           SF10 shape: 60M fact x 15M dim, SPARSE int64
                         keys, post-join filter on a dim STRING column.
                         Fact read l_okey(8)+l_qty(4); dim side
                         (8+4+4str)x15M amortized over 60M = +4; probe
                         tables in HBM                     = 16 B/row
  #4 sort / top-k        1B int64 keys, stored paired-int32 (lo+hi
                         planes; table.py Column.pair_hi). The
                         index-emit prune reads the hi plane (4 B/row);
                         sample slices, candidate-plane writes and
                         candidate gathers are O(cap)   ≈ 4.5 B/row
  #5 zipf skew proxy     zipf(1.2)-keyed GROUP BY + dim join on one
                         chip (the single-chip proxy of the N-host
                         skewed-shuffle config): read k(4)+v(4)+dim
                         probe(4)+masks(1)                 = 13 B/row
  #6 out-of-core agg     filter+GROUP BY over a 34 GiB VIRTUAL table
                         (>= 2x the 16 GiB HBM) streamed through one
                         fixed device capacity (igloo_tpu/ooc.py).
                         Reported outside the geomean: wall time here
                         is the dev tunnel's h2d path; the config's
                         claims are bounded device residency
                         (peak_live_gib) and exact results.

The headline metric is the geometric mean of per-config rows/s (device),
configs #1-#5.
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
    """Median wall time of the device query (result stays on device).
    Also records, in `_time_query.last`, the cold wall (first run =
    trace + XLA compile + execute) and the number of fragment program
    builds during the steady-state iterations (expected 0 — a nonzero
    count means the workload recompiles per query)."""
    from igloo_tpu.parallel import dist_exec
    t0 = time.perf_counter()
    eng.sql(sql)  # warm: trace + compile
    cold = time.perf_counter() - t0
    _log(f"warm {cold:.1f}s: {sql[:60]}")
    builds0 = dist_exec.PROGRAM_BUILDS
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        eng.sql(sql)
        times.append(time.perf_counter() - t0)
    _time_query.last = {
        "cold_wall_seconds": cold,
        "steady_recompiles": dist_exec.PROGRAM_BUILDS - builds0}
    return float(np.median(times))


# ---------------------------------------------------------------------------
# device-side data generation
# ---------------------------------------------------------------------------

def _mix64(x):
    """splitmix64 finalizer on uint64 device vectors."""
    import jax.numpy as jnp
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


def _dev_table(eng, name: str, nrows: int, build_fn, schema):
    """Register a device-generated table.

    build_fn(base, cnt) -> dict col -> jnp array of rows
    [base, base+cnt), or a (lo_i32, hi_i32) TUPLE for an INT64 column
    stored paired (table.py Column.pair_hi — a 2^30-row int64 column
    then lives in 8 GB instead of peaking 16 GB through the x64
    emulation). schema: dict col -> (SqlType, dictionary|None,
    stats|None) — stats mirror what parquet/arrow ingest computes (the
    span gates for the MXU group-by and direct-address joins read
    them). Generation is CHUNKED with buffer donation so an 8 GB column
    never needs 2x its size in HBM (iota+mix fusion peaks at buffer +
    one chunk).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from igloo_tpu.table import Column, DeviceTable, pad_count

    cap = pad_count(nrows)
    chunk = min(cap, 1 << 27)
    shapes = jax.eval_shape(functools.partial(build_fn, 0, 8192))

    def flat(vals):
        out = {}
        for k, v in vals.items():
            if isinstance(v, tuple):
                out[k + "\x00lo"], out[k + "\x00hi"] = v
            else:
                out[k] = v
        return out

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
    def fill(bufs, base, cnt):
        vals = flat(build_fn(base, cnt))
        return {k: jax.lax.dynamic_update_slice(bufs[k], vals[k], (base,))
                for k in bufs}

    bufs = {k: jnp.zeros((cap,), dtype=s.dtype)
            for k, s in flat(shapes).items()}
    base = 0
    while base < cap:
        cnt = min(chunk, cap - base)
        bufs = fill(bufs, jnp.int32(base), cnt)
        base += cnt
    cols = {}
    for cname in schema:
        st, dct, stats = schema[cname]
        if cname + "\x00lo" in bufs:
            cols[cname] = Column(data=bufs[cname + "\x00lo"], dtype=st,
                                 validity=None, dictionary=dct,
                                 stats=stats,
                                 pair_hi=bufs[cname + "\x00hi"])
        else:
            cols[cname] = Column(data=bufs[cname], dtype=st,
                                 validity=None, dictionary=dct,
                                 stats=stats)
    eng.register_table(name, DeviceTable(cols, nrows))


def main() -> None:
    import os

    import jax

    # IGLOO_BENCH_SCALE=K divides every row count by K (flow smoke);
    # IGLOO_BENCH_CPU=1 runs on the host CPU backend (no TPU needed)
    scale = int(os.environ.get("IGLOO_BENCH_SCALE", "1"))
    if os.environ.get("IGLOO_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        # TPU lowering smoke GATE: every Pallas kernel + one query per
        # operator family must compile and run on the real TPU before
        # any number is reported (r02's headline was lost to a Mosaic
        # lowering crash the CPU suite cannot catch). Runs in a
        # subprocess so a hard crash cannot corrupt this process; the
        # persistent compile cache makes reruns take seconds.
        import subprocess
        _log("running TPU lowering smoke gate (scripts/smoke_tpu.py)")
        smoke = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "smoke_tpu.py")],
            stdout=sys.stderr, timeout=1800)
        if smoke.returncode != 0:
            _log("SMOKE GATE FAILED — refusing to report benchmark "
                 "numbers (fix the lowering failure first)")
            sys.exit(1)
        _log("smoke gate passed")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from igloo_tpu import QueryEngine
    from igloo_tpu.dtypes import SqlType

    eng = QueryEngine(result_cache=False)
    bw = _hbm_bandwidth_gbps() * 1e9

    # one d2h up front: flip the tunnel to synchronous dispatch so wall
    # timings are honest (CLAUDE.md TIMING TRAP)
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)

    results = {}

    def cleanup() -> None:
        # fragment/result caches retain device arrays of dropped tables
        # (compiled runners capture their input buffers); the 0.75B sort
        # needs ~15.5 of the 15.75 GB chip, so every leftover matters
        import gc
        eng._last_frag = None
        eng._frag_cache.clear()
        gc.collect()
        live = sum(x.nbytes for x in jax.live_arrays())
        _log(f"live device bytes: {live / 2**30:.2f} GiB")

    def run(name: str, sql: str, n_rows: int, bytes_per_row: float) -> None:
        wall = _time_query(eng, sql)
        dev = _time_device(eng, sql)
        if dev <= 0:
            dev = wall       # CPU smoke runs have no device trace
        roofline = bw / bytes_per_row
        rows_s = n_rows / dev
        results[name] = {
            "rows_per_s": rows_s, "seconds": dev, "wall_seconds": wall,
            "sol": rows_s / roofline, **_time_query.last}
        _log(f"{name}: device {dev*1e3:.1f}ms wall {wall*1e3:.1f}ms "
             f"sol {rows_s / roofline:.4f}")

    def iota64(base, cnt):
        return (jax.lax.iota(jnp.uint64, cnt)
                + jnp.asarray(base).astype(jnp.uint64))

    # ---- config #1: filter + projection ----
    n1 = (1 << 26) // scale
    _log("generating filter table (device)")

    def gen_people(base, cnt):
        h = _mix64(iota64(base, cnt))
        return {"age": (h % jnp.uint64(100)).astype(jnp.int32),
                "name": ((h >> jnp.uint64(8)) % jnp.uint64(100_000))
                .astype(jnp.int32)}

    _dev_table(eng, "people", n1, gen_people,
               {"age": (SqlType.INT32, None, (0, 99)),
                "name": (SqlType.INT32, None, (0, 99_999))})
    run("filter_projection", "SELECT name FROM people WHERE age > 25",
        n1, 13)
    eng.sql("DROP TABLE people")
    cleanup()

    # ---- config #2: low-cardinality hash aggregate ----
    n2 = 100_000_000 // scale   # BASELINE config #2: 100M rows
    _log("generating aggregate table (device)")

    def gen_events(base, cnt):
        h = _mix64(iota64(base, cnt))
        return {"k": (h % jnp.uint64(256)).astype(jnp.int32),
                "v": ((h >> jnp.uint64(16)) % jnp.uint64(1000))
                .astype(jnp.int32)}

    _dev_table(eng, "events", n2, gen_events,
               {"k": (SqlType.INT32, None, (0, 255)),
                "v": (SqlType.INT32, None, (0, 999))})
    run("hash_aggregate",
        "SELECT k, sum(v) AS s, count(*) AS c FROM events GROUP BY k",
        n2, 9)
    eng.sql("DROP TABLE events")
    cleanup()

    # ---- config #3: SF10-shaped fact-dim join, sparse int64 keys,
    # post-join filter on a dim STRING column ----
    n3 = 60_000_000 // scale
    ndim = 15_000_000 // scale
    _log("generating join tables (device)")
    prio_dict = np.asarray(["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW"], dtype=object)

    def gen_orders(base, cnt):
        i = iota64(base, cnt)
        h = _mix64(i)
        return {"o_okey": (i * jnp.uint64(4)).astype(jnp.int64),
                "o_prio": (h % jnp.uint64(5)).astype(jnp.int32)}

    def gen_lineitem(base, cnt):
        h = _mix64(iota64(base, cnt))
        return {"l_okey": ((h % jnp.uint64(ndim)) * jnp.uint64(4))
                .astype(jnp.int64),
                "l_qty": (jnp.uint64(1) + (h >> jnp.uint64(32))
                          % jnp.uint64(50)).astype(jnp.int32)}

    _dev_table(eng, "orders", ndim, gen_orders,
               {"o_okey": (SqlType.INT64, None, (0, (ndim - 1) * 4)),
                "o_prio": (SqlType.STRING, prio_dict, None)})
    _dev_table(eng, "lineitem", n3, gen_lineitem,
               {"l_okey": (SqlType.INT64, None, (0, (ndim - 1) * 4)),
                "l_qty": (SqlType.INT32, None, (1, 50))})
    join_sql = ("SELECT sum(l_qty) AS s FROM lineitem JOIN orders "
                "ON l_okey = o_okey WHERE o_prio < '3-MEDIUM'")
    # first-query cost (probe sort paid in-query, unclustered layout),
    # then cluster the fact table by the join key (engine-owned physical
    # layout; normally applied lazily by auto_cluster after query #1)
    # and report the amortized steady state as the headline
    eng.auto_cluster = False
    first_wall = _time_query(eng, join_sql, iters=3)
    first_dev = _time_device(eng, join_sql)
    _log(f"hash_join FIRST query (unclustered): device {first_dev*1e3:.1f}ms "
         f"wall {first_wall*1e3:.1f}ms")
    t0 = time.perf_counter()
    eng.cluster_table("lineitem", "l_okey")
    jax.block_until_ready(eng._ptables["lineitem"].cols["l_okey"].data)
    cluster_s = time.perf_counter() - t0
    _log(f"clustered lineitem by l_okey in {cluster_s*1e3:.1f}ms")
    run("hash_join", join_sql, n3, 16)
    results["hash_join"]["first_seconds"] = first_dev
    results["hash_join"]["first_wall_seconds"] = first_wall
    results["hash_join"]["cluster_seconds"] = cluster_s
    eng.auto_cluster = True
    eng.sql("DROP TABLE lineitem")
    eng.sql("DROP TABLE orders")
    cleanup()

    # ---- config #5 proxy: zipf-skewed GROUP BY + join, one chip ----
    n5 = (1 << 24) // scale
    nzdim = max((1 << 20) // scale, 1 << 10)
    _log("generating zipf tables (device)")

    def gen_zipf(base, cnt):
        h = _mix64(iota64(base, cnt))
        # zipf(1.2)-tailed keys via inverse CDF: P(K >= k) ~ k^-0.2
        u = (h >> jnp.uint64(40)).astype(jnp.float32) / jnp.float32(1 << 24)
        u = jnp.maximum(u, jnp.float32(1e-7))
        k = jnp.minimum(u ** jnp.float32(-5.0), jnp.float32(nzdim))
        return {"k": k.astype(jnp.int32) - 1,      # [0, nzdim)
                "v": ((h >> jnp.uint64(16)) % jnp.uint64(1000))
                .astype(jnp.int32)}

    def gen_zdim(base, cnt):
        i = iota64(base, cnt)
        h = _mix64(i)
        return {"k": i.astype(jnp.int32),
                "w": (h % jnp.uint64(7)).astype(jnp.int32)}

    _dev_table(eng, "zev", n5, gen_zipf,
               {"k": (SqlType.INT32, None, (0, nzdim - 1)),
                "v": (SqlType.INT32, None, (0, 999))})
    _dev_table(eng, "zdim", nzdim, gen_zdim,
               {"k": (SqlType.INT32, None, (0, nzdim - 1)),
                "w": (SqlType.INT32, None, (0, 6))})
    run("zipf_groupby_join",
        "SELECT w, count(*) AS c, sum(v) AS s FROM zev JOIN zdim "
        "ON zev.k = zdim.k GROUP BY w",
        n5, 13)
    eng.sql("DROP TABLE zev")
    eng.sql("DROP TABLE zdim")
    cleanup()

    # ---- config #4: top-k over 1B int64 keys (BASELINE scale) ----
    # The column is stored paired-int32 (table.py Column.pair_hi): the
    # 2^30-row int64 column lives in 8 GB, and the index-emit top-k
    # prune reads the hi plane directly — the 64-bit lanes never
    # materialize. Traffic model: hi-plane read (4 B/row) + strided
    # sample + candidate-plane writes and per-plane candidate gathers
    # (all O(cap), negligible) ≈ 4.5 B/row.
    n4 = (1 << 30) // scale
    _log("generating 1B-row sort table (device)")

    def gen_keys(base, cnt):
        k = _mix64(iota64(base, cnt)) >> jnp.uint64(2)
        lo = jax.lax.bitcast_convert_type(
            (k & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            (k >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        return {"k": (lo, hi)}

    _dev_table(eng, "keys64", n4, gen_keys,
               {"k": (SqlType.INT64, None, None)})
    run("sort_topk", "SELECT k FROM keys64 ORDER BY k LIMIT 1000", n4, 4.5)
    eng.sql("DROP TABLE keys64")
    cleanup()

    # ---- config #6: out-of-core streaming aggregate over a table
    # >= 2x device HBM (igloo_tpu/ooc.py). The table is VIRTUAL — a
    # deterministic generator produces each chunk on the host, so
    # neither host RAM nor HBM ever holds it whole; the engine streams
    # chunks through one fixed device capacity and merges decomposed
    # partials. Reported OUTSIDE the geomean: throughput here measures
    # the dev tunnel's host->device path (the reference's equivalent is
    # 1024-row streamed batches, parquet_scan.rs:46-82 — also
    # ingest-bound). What this config proves: bounded device residency
    # (peak_live_gib) + exact results (generator-side accumulators).
    ooc_report = None
    if not os.environ.get("IGLOO_BENCH_SKIP_OOC"):
        # the 32 GiB stream takes ~20 min through the dev tunnel
        # (~26 MB/s h2d) — run it in a TIMEBOXED subprocess so a
        # bad-tunnel day cannot swallow the whole benchmark (the main
        # JSON line must always print). Measured full-scale result on
        # this chip: 64 chunks, 1255 s wall, peak live 0.50 GiB,
        # exact_match true (r5).
        import subprocess
        budget = int(os.environ.get("IGLOO_OOC_TIMEOUT", "2400"))
        _log(f"ooc aggregate: subprocess, budget {budget}s")
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--ooc",
                 str(scale)],
                stdout=subprocess.PIPE, stderr=sys.stderr, timeout=budget)
            line = [ln for ln in p.stdout.decode().splitlines()
                    if ln.startswith("{")]
            ooc_report = json.loads(line[-1]) if line else {
                "error": f"ooc subprocess rc={p.returncode}"}
        except subprocess.TimeoutExpired:
            ooc_report = {"timed_out": True, "budget_s": budget,
                          "note": "tunnel h2d too slow this run; "
                                  "full-scale reference: 1255s, exact"}
        if ooc_report.get("exact_match") is False:
            _log("OOC RESULT MISMATCH — refusing to report")
            sys.exit(1)

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
                "speed_of_light_fraction": round(v["sol"], 4),
                **{kk: round(v[kk], 4) for kk in
                   ("first_seconds", "first_wall_seconds",
                    "cluster_seconds", "cold_wall_seconds") if kk in v},
                **({"steady_recompiles": v["steady_recompiles"]}
                   if "steady_recompiles" in v else {})}
            for k, v in results.items()
        },
        **({"ooc_aggregate": ooc_report} if ooc_report else {}),
        "device": str(jax.devices()[0]),
    }))


def ooc_main(scale: int) -> None:
    """Config #6 (out-of-core streaming aggregate) as a standalone run:
    prints ONE JSON line with the ooc report (consumed by main())."""
    import os

    import jax

    if os.environ.get("IGLOO_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import pyarrow as _pa

    from igloo_tpu import QueryEngine

    eng = QueryEngine(result_cache=False)
    n6 = (1 << 31) // scale
    chunk_rows = min(1 << 25, max(n6 // 4, 1 << 13))
    acc = {"cnt": 0, "sum": 0, "starts": set()}

    def ooc_chunk(start, stop, columns):
        i = np.arange(start, stop, dtype=np.uint64)
        h = i.copy()
        h ^= h >> 30
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> 27
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> 31
        g = (h % np.uint64(1024)).astype(np.int64)
        v = ((h >> np.uint64(16)) % np.uint64(100_000)).astype(np.int64)
        if start not in acc["starts"]:     # oracle (first pass only)
            acc["starts"].add(start)
            m = v > 50_000
            acc["cnt"] += int(m.sum())
            acc["sum"] += int(v[m].sum())
        out = {"g": g, "v": v}
        return {c: out[c] for c in columns}

    eng.register_chunked(
        "big", fields=_pa.schema([("g", _pa.int64()), ("v", _pa.int64())]),
        nrows=n6, chunk_fn=ooc_chunk, chunk_rows=chunk_rows)
    _log(f"ooc aggregate: streaming {n6 * 16 / 2**30:.1f} GiB "
         f"virtual table in {-(-n6 // chunk_rows)} chunks")
    t0 = time.perf_counter()
    got = eng.sql(
        "SELECT g, sum(v) AS s, count(*) AS c FROM big "
        "WHERE v > 50000 GROUP BY g").to_arrow()
    ooc_wall = time.perf_counter() - t0
    exact = (sum(got.column("c").to_pylist()) == acc["cnt"]
             and sum(got.column("s").to_pylist()) == acc["sum"])
    st = eng.last_ooc
    hbm = None
    try:
        hbm = jax.devices()[0].memory_stats().get("bytes_limit")
    except Exception:
        pass
    report = {
        "rows_per_s": round(n6 / ooc_wall),
        "wall_seconds": round(ooc_wall, 2),
        "table_gib": round(n6 * 16 / 2**30, 2),
        "hbm_gib": round(hbm / 2**30, 2) if hbm else None,
        "chunks": st.chunks if st else None,
        "peak_live_gib": round(st.peak_live_bytes / 2**30, 3)
        if st else None,
        "exact_match": exact,
    }
    _log(f"ooc_aggregate: wall {ooc_wall:.1f}s exact={exact} "
         f"peak live {report['peak_live_gib']} GiB")
    print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ooc":
        ooc_main(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    else:
        main()
