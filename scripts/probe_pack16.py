"""Probe: do packed narrow dtypes (int16/int8/bf16-bitcast) buy VPU
throughput on this TPU through the remote Mosaic compiler?

VERDICT r4 #6: the filter/aggregate kernels sit at int32 VPU op-count
floors (compact ~0.13 ns/row, groupby_mxu ~0.094 ns/row). If Mosaic
executes int16/int8 element ops 2x/4x per lane, the floors halve.
This measures a compare+select+add chain (the kernels' op mix) at each
width, using profiler device durations (wall through the tunnel pays a
~25 ms dispatch floor — CLAUDE.md TIMING TRAP).

Run: python scripts/probe_pack16.py
"""

import functools
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

STAGES = 32


def _kernel(x_ref, o_ref, *, dt):
    x = x_ref[...]
    acc = jnp.zeros_like(x)
    one = jnp.ones((), dt)
    for i in range(STAGES):
        c = (x > jnp.asarray(i, dt))
        acc = acc + jnp.where(c, x, one)
        x = x ^ acc if jnp.issubdtype(dt, jnp.integer) else x + acc
    o_ref[...] = acc


def build(dt, rows):
    shape = (rows, 128)
    spec = pl.BlockSpec((min(rows, 1024), 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, dt=dt),
        grid=(rows // min(rows, 1024),),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, dt),
    )


def device_seconds(td):
    from scripts.xplane import module_times
    return sum(d for _, d in module_times(td)) / 1e6


def main():
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)   # sync dispatch
    n_elem = 1 << 26
    results = {}
    for dt, name in ((jnp.int32, "int32"), (jnp.int16, "int16"),
                     (jnp.int8, "int8"), (jnp.float32, "f32"),
                     (jnp.bfloat16, "bf16")):
        rows = n_elem // 128
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 100, (rows, 128)),
            dtype=dt)
        try:
            fn = jax.jit(build(dt, rows))
            out = fn(x)
            out.block_until_ready()
            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    fn(x).block_until_ready()
                dev = device_seconds(td)
            ops = n_elem * STAGES * 3          # cmp + select + add/xor
            results[name] = dev
            print(f"{name:6s}: {dev*1e3:8.3f} ms  "
                  f"{dev/n_elem*1e12:6.2f} ps/elem  "
                  f"{ops/dev/1e12:6.2f} Tops/s", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"{name:6s}: FAILED — {msg}", flush=True)
    if "int32" in results and "int16" in results:
        print(f"int16 speedup vs int32: "
              f"{results['int32']/results['int16']:.2f}x")
    if "int32" in results and "int8" in results:
        print(f"int8  speedup vs int32: "
              f"{results['int32']/results['int8']:.2f}x")


if __name__ == "__main__":
    main()
