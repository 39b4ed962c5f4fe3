"""TPU lowering smoke: compile + run EVERY Pallas kernel with x64 on.

The CPU test suite runs all Pallas kernels in interpret mode, so it
structurally cannot catch Mosaic (TPU) lowering failures — round 2
shipped a kernel that passed 260 CPU tests and crashed the benchmark
(`extract.py` emitted an int64 convert under the engine's x64 mode;
Mosaic rejects 64-bit types). This script is the commit-ritual guard:
run it on the TPU machine after ANY kernel or dist_exec change.

Coverage:
  - ops/pallas/extract.py    (fused top-k candidate pass; i64+i32+fbits
    key classes — the exact configuration bench config #4 lowers)
  - ops/pallas/compact.py    (dense mask compaction)
  - ops/pallas/vmem_gather.py (VMEM page-walk gather)
  - ops/pallas/groupby_mxu.py (factorized MXU group-by)
  - four mini SQL queries shaped like BASELINE configs #1-#4, sized to
    engage the same kernel paths end-to-end (the ORDER BY LIMIT table
    is >= 2^18 rows so the fused top-k path is taken, not the general
    one).

Everything runs with jax_enable_x64=True — the engine's production
configuration (bench.py:97, __graft_entry__.py) and the configuration
that exposes trace/lowering dtype promotion bugs.

Exit code 0 = all kernels lowered and ran on TPU. Tiny shapes: with the
persistent compile cache this takes seconds on reruns.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/igloo_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    if jax.default_backend() != "tpu":
        print("smoke_tpu: default backend is not TPU — nothing to verify",
              file=sys.stderr)
        return 1

    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"  ok   {name}  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report every kernel
            failures.append((name, e))
            print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            if os.environ.get("SMOKE_TB"):
                import traceback
                traceback.print_exc()

    # one d2h up front: flips the tunnel to synchronous dispatch so a
    # kernel that dies at RUN time (not compile time) surfaces here
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)

    rng = np.random.default_rng(0)

    # ---- extract: fused top-k candidate kernel ----
    def smoke_extract():
        from igloo_tpu.ops.pallas.extract import extract_candidate_rows
        n = 8192
        alive = jnp.ones((n,), jnp.bool_)
        k64 = rng.integers(0, 1 << 40, n)
        lo = jnp.asarray((k64 & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
        hi = jnp.asarray((k64 >> 32).astype(np.uint32).view(np.int32))
        k32 = jnp.asarray(rng.integers(-1000, 1000, n).astype(np.int32))
        fb = jax.lax.bitcast_convert_type(
            jnp.asarray(rng.normal(size=n).astype(np.float32)), jnp.int32)
        valid = jnp.asarray(rng.integers(0, 2, n).astype(bool))
        planes = (hi, lo, k32, fb)
        valids = (valid,)
        key_specs = (
            ("i64", False, True, True, (0, 1), 0),
            ("i32", True, False, False, (2,), 0),
            ("fbits", False, True, True, (3,), 0),
        )
        thr = jnp.asarray([n // 2] + [0x7FFFFFFF, -1] * 3, jnp.int32)
        _, _, _, stats = extract_candidate_rows(
            thr, alive, planes, valids, key_specs=key_specs,
            cap_rows=256, interpret=False)
        s = jax.device_get(stats)
        assert s[2] == n, s  # alive count sanity

    check("pallas/extract.extract_candidate_rows", smoke_extract)

    # ---- extract: index-emit variant (1B top-k path) ----
    def smoke_extract_idx():
        from igloo_tpu.ops.pallas.extract import extract_candidate_indices
        n = 8192
        alive = jnp.ones((n,), jnp.bool_)
        k64 = rng.integers(0, 1 << 62, n)
        hi = jnp.asarray((k64 >> 32).astype(np.uint32).view(np.int32))
        key_specs = (("i64", False, True, True, (0, 0), 0),)
        thr = jnp.asarray(
            [0x7FFFFFFF,
             np.int32((((1 << 61) >> 32) ^ 0x80000000) >> 1), -1],
            jnp.int32)
        idx_p, mask_p, stats = extract_candidate_indices(
            thr, alive, (hi,), key_specs=key_specs, cap_rows=8192,
            interpret=False)
        s = jax.device_get(stats)
        # uhi = ((hi ^ 0x80000000) >> 1); threshold at key 2^61 → ~half
        want = int((((k64 >> 32).astype(np.uint32) ^ 0x80000000) >> 1
                    <= (((1 << 61) >> 32) ^ 0x80000000) >> 1).sum())
        assert s[1] == want, (s, want)

    check("pallas/extract.extract_candidate_indices", smoke_extract_idx)

    # ---- compact: dense mask compaction ----
    def smoke_compact():
        from igloo_tpu.ops.pallas.compact import compact_rows
        cap = 8192
        mask = jnp.asarray(rng.integers(0, 2, cap).astype(bool))
        a32 = jnp.asarray(rng.integers(0, 100, cap).astype(np.int32))
        a64 = jnp.asarray(rng.integers(0, 1 << 40, cap).astype(np.int64))
        af = jnp.asarray(rng.normal(size=cap).astype(np.float32))
        arrs, _, count = compact_rows(mask, [a32, a64, af], [None, mask, None])
        c = int(jax.device_get(count))
        got = jax.device_get(arrs[0][:c])
        want = jax.device_get(a32)[jax.device_get(mask)]
        assert (got == want).all()

    check("pallas/compact.compact_rows", smoke_compact)

    # ---- vmem_gather: page-walk gather ----
    def smoke_vmem_gather():
        from igloo_tpu.ops.pallas.vmem_gather import vmem_gather
        b, nq = 4096, 2048
        tab32 = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
        tab64 = jnp.asarray(rng.integers(0, 1 << 40, b).astype(np.int64))
        idx = jnp.asarray(rng.integers(0, b, nq).astype(np.int32))
        o32, o64 = vmem_gather([tab32, tab64], idx, interpret=False)
        got = jax.device_get(o64)
        want = jax.device_get(tab64)[jax.device_get(idx)]
        assert (got == want).all()

    check("pallas/vmem_gather.vmem_gather", smoke_vmem_gather)

    # ---- groupby_mxu: factorized MXU aggregation ----
    def smoke_groupby():
        from igloo_tpu.ops.pallas.groupby_mxu import groupby_fused_sums
        n, g = 1 << 15, 64
        key = jnp.asarray(rng.integers(0, g, n).astype(np.int32))
        val = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))
        sums = groupby_fused_sums(
            key, None, (val,), (), lo_key=0, span=g, g_pad=g,
            col_spec=(("s", 0, None, 4), ("p",)), interpret=False)
        got = jax.device_get(sums)
        kk, vv = jax.device_get(key), jax.device_get(val)
        want = np.zeros((g,), np.float64)
        np.add.at(want, kk, vv)
        assert np.allclose(got[:, 0], want), (got[:5, 0], want[:5])

    check("pallas/groupby_mxu.groupby_fused_sums", smoke_groupby)

    # ---- mini end-to-end queries: the four bench shapes ----
    def smoke_queries():
        import pyarrow as pa
        from igloo_tpu import QueryEngine
        eng = QueryEngine(result_cache=False)
        n = 1 << 18      # >= 2^18: engages the fused top-k path
        eng.register_table("s_people", pa.table({
            "age": pa.array(rng.integers(0, 100, n), type=pa.int32()),
            "name": pa.array(rng.integers(0, 1000, n), type=pa.int32()),
        }))
        eng.register_table("s_events", pa.table({
            "k": pa.array(rng.integers(0, 256, n), type=pa.int32()),
            "v": pa.array(rng.integers(0, 1000, n), type=pa.int32()),
        }))
        eng.register_table("s_line", pa.table({
            "okey": pa.array(rng.integers(0, 4096, n), type=pa.int64()),
            "qty": pa.array(rng.integers(1, 50, n), type=pa.int32()),
        }))
        eng.register_table("s_orders", pa.table({
            "okey": pa.array(rng.permutation(8192)[:4096], type=pa.int64()),
            "prio": pa.array(rng.integers(0, 5, 4096), type=pa.int32()),
        }))
        eng.register_table("s_keys", pa.table({
            "k": pa.array(rng.integers(0, 1 << 62, n), type=pa.int64()),
        }))
        # paired-int32 int64 storage (bench config #4's physical layout)
        from igloo_tpu.table import Column, DeviceTable, pad_count
        from igloo_tpu.dtypes import SqlType
        v = rng.integers(0, 1 << 62, pad_count(n)).astype(np.int64)
        lo = (v & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        hi = ((v >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        eng.register_table("s_pkeys", DeviceTable(
            {"k": Column(data=jnp.asarray(lo), dtype=SqlType.INT64,
                         pair_hi=jnp.asarray(hi))}, n))
        return eng

    try:
        eng = smoke_queries()
    except Exception as e:  # noqa: BLE001
        failures.append(("engine setup", e))
        print(f"  FAIL engine setup: {type(e).__name__}: {str(e)[:200]}")
        eng = None

    if eng is not None:
        for label, sql in (
            ("q1 filter+projection",
             "SELECT name FROM s_people WHERE age > 25"),
            ("q2 groupby sum/count",
             "SELECT k, sum(v) AS s, count(*) AS c FROM s_events GROUP BY k"),
            ("q3 join int64-keys + filter",
             "SELECT sum(qty) AS s FROM s_line JOIN s_orders "
             "ON s_line.okey = s_orders.okey WHERE prio < 3"),
            ("q4 order-by limit (fused top-k)",
             "SELECT k FROM s_keys ORDER BY k LIMIT 1000"),
            ("q5 order-by limit (paired-int64 planes)",
             "SELECT k FROM s_pkeys ORDER BY k LIMIT 1000"),
            ("q6 dense-unique slot join",
             "SELECT sum(qty) AS s FROM s_line JOIN s_orders "
             "ON s_line.okey = s_orders.okey"),
        ):
            check(label, lambda sql=sql: eng.sql(sql))

    if failures:
        print(f"smoke_tpu: {len(failures)} FAILURE(S)", file=sys.stderr)
        return 1
    print("smoke_tpu: all kernels lowered and ran on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
