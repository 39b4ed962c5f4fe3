"""Focused config #3 (SF10-shaped join) run on the real TPU: first-query
(unclustered, in-query probe sort) vs clustered steady state. Dev tool
for the cluster-layout work; bench.py reports the official numbers."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import bench as B
from igloo_tpu import QueryEngine
from igloo_tpu.dtypes import SqlType

import numpy as np

eng = QueryEngine(result_cache=False)
jax.device_get(jnp.zeros((8,), jnp.int32) + 1)   # flip tunnel to sync

n3, ndim = 60_000_000, 15_000_000
prio_dict = np.asarray(["1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW"], dtype=object)


def iota64(base, cnt):
    return (jax.lax.iota(jnp.uint64, cnt)
            + jnp.asarray(base).astype(jnp.uint64))


def gen_orders(base, cnt):
    i = iota64(base, cnt)
    h = B._mix64(i)
    return {"o_okey": (i * jnp.uint64(4)).astype(jnp.int64),
            "o_prio": (h % jnp.uint64(5)).astype(jnp.int32)}


def gen_lineitem(base, cnt):
    h = B._mix64(iota64(base, cnt))
    return {"l_okey": ((h % jnp.uint64(ndim)) * jnp.uint64(4))
            .astype(jnp.int64),
            "l_qty": (jnp.uint64(1) + (h >> jnp.uint64(32))
                      % jnp.uint64(50)).astype(jnp.int32)}


B._dev_table(eng, "orders", ndim, gen_orders,
             {"o_okey": (SqlType.INT64, None, (0, (ndim - 1) * 4)),
              "o_prio": (SqlType.STRING, prio_dict, None)})
B._dev_table(eng, "lineitem", n3, gen_lineitem,
             {"l_okey": (SqlType.INT64, None, (0, (ndim - 1) * 4)),
              "l_qty": (SqlType.INT32, None, (1, 50))})

sql = ("SELECT sum(l_qty) AS s FROM lineitem JOIN orders "
       "ON l_okey = o_okey WHERE o_prio < '3-MEDIUM'")

eng.auto_cluster = False
w = B._time_query(eng, sql, iters=3)
d = B._time_device(eng, sql)
print(f"FIRST (unclustered): device {d*1e3:.1f}ms wall {w*1e3:.1f}ms",
      flush=True)
r1 = eng.execute(sql).column(0).to_pylist()

t0 = time.perf_counter()
eng.cluster_table("lineitem", "l_okey")
jax.block_until_ready(eng._ptables["lineitem"].cols["l_okey"].data)
print(f"cluster: {time.perf_counter()-t0:.2f}s", flush=True)

w = B._time_query(eng, sql, iters=3)
d = B._time_device(eng, sql)
print(f"CLUSTERED: device {d*1e3:.1f}ms wall {w*1e3:.1f}ms", flush=True)
r2 = eng.execute(sql).column(0).to_pylist()
print("results equal:", r1 == r2, r1, flush=True)
