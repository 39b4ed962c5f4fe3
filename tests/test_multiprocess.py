"""True multi-PROCESS distributed execution (2 processes × 4 devices).

The other distributed tests run the SPMD programs on a single-process
8-device CPU mesh; this one actually spans processes the way a
multi-host TPU slice does: `jax.distributed.initialize` + gloo CPU
collectives, a process-spanning Mesh, cross-process shuffles inside
shard_map, and result egress through process_allgather
(parallel/mesh.py global_get).

≙ the reference's multi-node story, which it never reaches (its worker
ExecuteTask is a stub returning "SUBMITTED",
/root/reference/crates/worker/src/service.rs:14-25).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import json, sys
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    import pyarrow as pa
    from igloo_tpu.parallel.engine import DistributedQueryEngine

    eng = DistributedQueryEngine(result_cache=False)
    assert len(jax.devices()) == 8, len(jax.devices())

    rng = np.random.default_rng(7)          # SAME data on every process
    n, d = 5000, 64
    eng.register_table("t", pa.table({
        "g": pa.array(rng.integers(0, d, n), type=pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    }))
    dimk = rng.permutation(100000)[:d].astype(np.int64) * 1000003917
    eng.register_table("t2", pa.table({
        "k": pa.array(dimk[rng.integers(0, d, n)]),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int32()),
    }))
    eng.register_table("dim", pa.table({
        "k": pa.array(dimk),
        "label": pa.array((np.arange(d) % 5).astype(np.int32)),
    }))

    results = {}
    out = eng.execute("SELECT g, sum(v) AS s, count(*) AS c FROM t "
                      "GROUP BY g ORDER BY g")
    results["agg"] = {k: out.column(k).to_pylist() for k in ("g", "s", "c")}
    out = eng.execute("SELECT label, sum(t2.v) AS s FROM t2 "
                      "JOIN dim ON t2.k = dim.k "
                      "GROUP BY label ORDER BY label")
    results["join"] = {k: out.column(k).to_pylist()
                       for k in ("label", "s")}
    out = eng.execute("SELECT v FROM t ORDER BY v DESC LIMIT 5")
    results["topk"] = out.column("v").to_pylist()
    print("RESULT" + str(pid) + ":" + json.dumps(results), flush=True)
""")


def test_two_process_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    port = "19735"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    parsed = {}
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"RESULT{i}:"):
                parsed[i] = json.loads(line.split(":", 1)[1])
    assert set(parsed) == {0, 1}
    # both processes computed identical global results (SPMD determinism)
    assert parsed[0] == parsed[1]

    # oracle: recompute on host
    import numpy as np
    rng = np.random.default_rng(7)
    n, d = 5000, 64
    g = rng.integers(0, d, n)
    v = rng.integers(0, 100, n)
    exp_s = [int(v[g == x].sum()) for x in range(d)]
    exp_c = [int((g == x).sum()) for x in range(d)]
    assert parsed[0]["agg"]["g"] == list(range(d))
    assert parsed[0]["agg"]["s"] == exp_s
    assert parsed[0]["agg"]["c"] == exp_c

    dimk = rng.permutation(100000)[:d].astype(np.int64) * 1000003917
    k2 = dimk[rng.integers(0, d, n)]
    v2 = rng.integers(0, 100, n)
    label = {kk: int(i % 5) for i, kk in enumerate(dimk)}
    sums = {}
    for kk, vv in zip(k2, v2):
        sums[label[kk]] = sums.get(label[kk], 0) + int(vv)
    assert parsed[0]["join"]["label"] == sorted(sums)
    assert parsed[0]["join"]["s"] == [sums[x] for x in sorted(sums)]

    assert parsed[0]["topk"] == sorted(v.tolist(), reverse=True)[:5]
