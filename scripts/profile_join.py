"""Profile the bench.py hash_join config (SF10 shape) with per-op report.

Usage: python scripts/profile_join.py [scale]
"""
from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from igloo_tpu import QueryEngine
    from igloo_tpu.dtypes import SqlType
    from scripts.xplane import print_report
    from bench import _dev_table, _mix64

    eng = QueryEngine(result_cache=False)
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)

    n3 = 60_000_000 // scale
    ndim = 15_000_000 // scale
    prio_dict = np.asarray(["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW"], dtype=object)

    def iota64(base, cnt):
        return (jax.lax.iota(jnp.uint64, cnt)
                + jnp.asarray(base).astype(jnp.uint64))

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
    sql = ("SELECT sum(l_qty) AS s FROM lineitem JOIN orders "
           "ON l_okey = o_okey WHERE o_prio < '3-MEDIUM'")
    print(eng.sql(sql))  # warm
    with tempfile.TemporaryDirectory(prefix="prof_join_") as td:
        with jax.profiler.trace(td):
            eng.sql(sql)
            jax.effects_barrier()
        print_report(td, top=30)


if __name__ == "__main__":
    main()
