"""Focused config #5 (zipf join+groupby) on the real TPU: why doesn't
clustered layout cut the 54 ms like it did for config #3? Dev tool."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import bench as B
from igloo_tpu import QueryEngine
from igloo_tpu.dtypes import SqlType

eng = QueryEngine(result_cache=False)
jax.device_get(jnp.zeros((8,), jnp.int32) + 1)

n5 = 1 << 24
nzdim = 1 << 20


def iota64(base, cnt):
    return (jax.lax.iota(jnp.uint64, cnt)
            + jnp.asarray(base).astype(jnp.uint64))


def gen_zipf(base, cnt):
    h = B._mix64(iota64(base, cnt))
    u = (h >> jnp.uint64(40)).astype(jnp.float32) / jnp.float32(1 << 24)
    u = jnp.maximum(u, jnp.float32(1e-7))
    k = jnp.minimum(u ** jnp.float32(-5.0), jnp.float32(nzdim))
    return {"k": k.astype(jnp.int32) - 1,
            "v": ((h >> jnp.uint64(16)) % jnp.uint64(1000))
            .astype(jnp.int32)}


def gen_zdim(base, cnt):
    i = iota64(base, cnt)
    h = B._mix64(i)
    return {"k": i.astype(jnp.int32),
            "w": (h % jnp.uint64(7)).astype(jnp.int32)}


B._dev_table(eng, "zev", n5, gen_zipf,
             {"k": (SqlType.INT32, None, (0, nzdim - 1)),
              "v": (SqlType.INT32, None, (0, 999))})
B._dev_table(eng, "zdim", nzdim, gen_zdim,
             {"k": (SqlType.INT32, None, (0, nzdim - 1)),
              "w": (SqlType.INT32, None, (0, 6))})

sql = ("SELECT w, count(*) AS c, sum(v) AS s FROM zev JOIN zdim "
       "ON zev.k = zdim.k GROUP BY w ORDER BY w")

eng.auto_cluster = False
w = B._time_query(eng, sql, iters=3)
d = B._time_device(eng, sql)
frag = eng._last_frag
print(f"UNCLUSTERED: device {d*1e3:.1f}ms wall {w*1e3:.1f}ms "
      f"dsort_state={getattr(frag, 'dsort_state', '?')} "
      f"hints={getattr(frag, 'cluster_hints', None)}", flush=True)
r1 = eng.execute(sql).to_pydict()

t0 = time.perf_counter()
eng.cluster_table("zev", "k")
jax.block_until_ready(eng._ptables["zev"].cols["k"].data)
print(f"cluster: {time.perf_counter()-t0:.2f}s", flush=True)

w = B._time_query(eng, sql, iters=3)
d = B._time_device(eng, sql)
frag = eng._last_frag
print(f"CLUSTERED: device {d*1e3:.1f}ms wall {w*1e3:.1f}ms "
      f"dsort_state={getattr(frag, 'dsort_state', '?')}", flush=True)
r2 = eng.execute(sql).to_pydict()
print("results equal:", r1 == r2, flush=True)
if r1 != r2:
    print("UNCLUSTERED:", r1, flush=True)
    print("CLUSTERED:  ", r2, flush=True)
