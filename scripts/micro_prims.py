"""Microbenchmark of TPU primitives that bound the join/sort redesign.

Measures DEVICE time (xplane) of each primitive in its own trace:
  sort32/sort64   lax.sort at various n, with/without payload planes
  gath<B>         XLA random int32 gather from a B-entry table
  gathrow<B>      packed int64 gather (one 8B row) from a B-entry table
  scatadd         .at[].add histogram: 15M updates into 64M bins
  cumsum          64M int32 cumsum
  vmem<B>         ops.pallas.vmem_gather at B-entry table
  copy            pure HBM copy roofline sanity (read+write 64M int32)

Usage: python scripts/micro_prims.py [name ...]   (default: all)
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/igloo_jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    from scripts.xplane import module_times

    which = set(sys.argv[1:])

    def want(name):
        return not which or any(name.startswith(w) for w in which)

    # flip tunnel to synchronous dispatch (CLAUDE.md TIMING TRAP)
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)

    def dev_time(fn, *args):
        out = jax.block_until_ready(fn(*args))  # warm/compile
        with tempfile.TemporaryDirectory(prefix="mb_") as td:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*args))
            return sum(d for _, d in module_times(td)) / 1e6, out

    def report(name, secs, n, bytes_per_row=None):
        line = f"{name:24s} {secs*1e3:9.3f} ms  {n/secs/1e6:10.1f} M/s"
        if bytes_per_row:
            line += f"  {n*bytes_per_row/secs/2**30:8.1f} GiB/s"
        print(line, flush=True)

    key = jax.random.PRNGKey(0)

    # ---- copy roofline sanity ----
    if want("copy"):
        n = 1 << 26
        x = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
        f = jax.jit(lambda a: a + 1)
        t, _ = dev_time(f, x)
        report("copy 64M i32", t, n, 8)

    # ---- lax.sort ----
    for nm, n, dt, npay in [
        ("sort32 16M", 1 << 24, jnp.int32, 0),
        ("sort32 16M +1pay", 1 << 24, jnp.int32, 1),
        ("sort32 16M +3pay", 1 << 24, jnp.int32, 3),
        ("sort32 64M +1pay", 1 << 26, jnp.int32, 1),
        ("sort64 16M +1pay", 1 << 24, jnp.int64, 1),
        ("sort8bit 16M +1pay", 1 << 24, "b8", 1),
    ]:
        if not want("sort") and not want(nm.split()[0]):
            continue
        if dt == "b8":
            k = jax.random.randint(key, (n,), 0, 256, jnp.int32)
        else:
            k = jax.random.randint(key, (n,), 0, jnp.iinfo(jnp.int32).max,
                                   dt)
        pays = [jnp.arange(n, dtype=jnp.int32) for _ in range(npay)]

        def f(k, *pays):
            return jax.lax.sort([k, *pays], num_keys=1)
        t, _ = dev_time(f, k, *pays)
        report(nm, t, n)

    # ---- XLA random gather, element + packed-row ----
    nprobe = 1 << 24
    for b in (1 << 14, 1 << 17, 1 << 20, 1 << 24, 1 << 26):
        if not want("gath"):
            continue
        tab = jax.random.randint(key, (b,), 0, 1 << 30, jnp.int32)
        tab64 = tab.astype(jnp.int64)
        idx = jax.random.randint(key, (nprobe,), 0, b, jnp.int32)
        f32 = jax.jit(lambda t, i: t[i])
        t, _ = dev_time(f32, tab, idx)
        report(f"gath i32 B=2^{b.bit_length()-1}", t, nprobe)
        t, _ = dev_time(f32, tab64, idx)
        report(f"gath i64 B=2^{b.bit_length()-1}", t, nprobe)

    # ---- 2D row gather: fetch (idx, :) rows of an (B, W) table ----
    for w in (8, 128):
        if not want("rowgath"):
            continue
        b = 1 << 20
        tab2 = jax.random.randint(key, (b, w), 0, 1 << 30, jnp.int32)
        idx = jax.random.randint(key, (nprobe,), 0, b, jnp.int32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        t, _ = dev_time(f, tab2, idx)
        report(f"rowgath w={w} B=2^20", t, nprobe, 4 * w)

    # ---- scatter-add histogram ----
    if want("scat"):
        nupd = 15_000_000
        nbin = 1 << 26
        idx = jax.random.randint(key, (nupd,), 0, nbin, jnp.int32)

        def f(i):
            return jnp.zeros((nbin,), jnp.int32).at[i].add(1, mode="drop")
        t, _ = dev_time(f, idx)
        report("scatadd 15M->64M", t, nupd)

        nbin2 = 1 << 16
        idx2 = jax.random.randint(key, (nupd,), 0, nbin2, jnp.int32)

        def f2(i):
            return jnp.zeros((nbin2,), jnp.int32).at[i].add(1, mode="drop")
        t, _ = dev_time(f2, idx2)
        report("scatadd 15M->64K", t, nupd)

    # ---- cumsum ----
    if want("cumsum"):
        n = 1 << 26
        x = jnp.ones((n,), jnp.int32)
        f = jax.jit(jnp.cumsum)
        t, _ = dev_time(f, x)
        report("cumsum 64M", t, n, 8)

    # ---- vmem_gather kernel ----
    from igloo_tpu.ops.pallas import vmem_gather as vg
    for b in (1 << 13, 1 << 15, 1 << 17):
        if not want("vmem"):
            continue
        tab = jax.random.randint(key, (b,), 0, 1 << 30, jnp.int32)
        idx = jax.random.randint(key, (nprobe,), 0, b, jnp.int32)

        def f(t_, i):
            return vg.vmem_gather([t_], i)[0]
        t, _ = dev_time(f, tab, idx)
        report(f"vmem B=2^{b.bit_length()-1}", t, nprobe)

    # ---- searchsorted sanity ----
    if want("searchsorted"):
        b = 1 << 20
        tab = jnp.sort(jax.random.randint(key, (b,), 0, 1 << 30, jnp.int32))
        idx = jax.random.randint(key, (1 << 20,), 0, 1 << 30, jnp.int32)
        f = jax.jit(lambda t, i: jnp.searchsorted(t, i))
        t, _ = dev_time(f, tab, idx)
        report("searchsorted 1M/1M", t, 1 << 20)


if __name__ == "__main__":
    main()
