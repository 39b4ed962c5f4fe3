"""Diagnostic: where does warm query time go? (tunnel latency vs compute)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import pyarrow as pa
    from igloo_tpu import QueryEngine
    from igloo_tpu.parallel import dist_exec

    eng = QueryEngine(result_cache=False)
    rng = np.random.default_rng(0)
    n1 = 1 << 26
    eng.register_table("people", pa.table({
        "age": pa.array(rng.integers(0, 100, n1), type=pa.int32()),
        "name": pa.array(rng.integers(0, 100_000, n1), type=pa.int32()),
    }))

    # patch _run_once to time the pieces
    orig = dist_exec.DistFragment._run_once

    def timed(self, plan):
        t0 = time.perf_counter()
        cache_key = (self.shuffle_factor, self.join_factor, self.join_expand)
        entry = self._compiled.get(cache_key)
        assert entry is not None, "run warm first"
        compiled, in_arrays, aux_arrays, dict_env = entry
        t1 = time.perf_counter()
        out = compiled(in_arrays, aux_arrays)
        t2 = time.perf_counter()
        jax.block_until_ready(out[3])
        t3 = time.perf_counter()
        overflow = bool(jax.device_get(out[3]))
        t4 = time.perf_counter()
        counts_host = np.asarray(jax.device_get(out[2]))
        t5 = time.perf_counter()
        print(f"  entry-lookup {1e3*(t1-t0):6.1f}ms dispatch {1e3*(t2-t1):6.1f}ms "
              f"block {1e3*(t3-t2):6.1f}ms get-ovf {1e3*(t4-t3):6.1f}ms "
              f"get-counts {1e3*(t5-t4):6.1f}ms")
        return orig(self, plan)

    sql = "SELECT name FROM people WHERE age > 25"
    t0 = time.perf_counter()
    eng.sql(sql)
    print(f"warm {time.perf_counter()-t0:.1f}s")
    dist_exec.DistFragment._run_once = timed
    for _ in range(3):
        t0 = time.perf_counter()
        eng.sql(sql)
        print(f"total {1e3*(time.perf_counter()-t0):6.1f}ms")

    # raw tunnel latency: tiny jitted op round trip
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    f(x).block_until_ready()
    for _ in range(3):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        print(f"tiny-dispatch {1e3*(time.perf_counter()-t0):6.1f}ms")
    # device_get on a completed tiny array
    y = f(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    jax.device_get(y)
    print(f"device_get-after-ready {1e3*(time.perf_counter()-t0):6.1f}ms")


if __name__ == "__main__":
    main()
