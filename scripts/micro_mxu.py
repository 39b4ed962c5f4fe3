"""Microbench: MXU dot K-streaming rates inside Pallas.

Validates the factorized one-hot groupby design: per row-block the kernel
builds one-hots in VMEM and does ONE (M<=128, K) @ (K, N<=128) dot; this
measures how fast K streams for f32 vs bf16 plus in-kernel build cost.
Only the row data (slots + value planes) streams from HBM, as in the
real kernel.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS = 1 << 24          # 16M rows
BLK = 8192                # rows per grid step


def dot_kernel(slot_ref, o_ref, *, m, n, sub, dt):
    """Pure dot rate: operands built from iota (no real one-hot work)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    b = BLK // sub
    acc = jnp.zeros((m, n), jnp.float32)
    for s in range(sub):
        sl = slot_ref[s * (b // 128):(s + 1) * (b // 128), :].reshape(1, b)
        a = jnp.broadcast_to(sl.astype(dt), (m, b))
        bb = jnp.broadcast_to(sl.astype(dt), (n, b))
        acc = acc + jax.lax.dot_general(
            a, bb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] += acc


def onehot_kernel(slot_ref, v_ref, o_ref, *, m, n, sub, dt):
    """Full factorized build: hi/lo onehots + plane mul + one dot."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    nplanes = m // 8          # H = 8 hi groups
    acc = jnp.zeros((m, n), jnp.float32)
    b = BLK // sub
    for s in range(sub):
        slots = slot_ref[s * (b // 128):(s + 1) * (b // 128), :].reshape(1, b)
        vals = v_ref[:, s * b:(s + 1) * b]            # (nplanes, b)
        hi = slots // n
        lo = slots % n
        hid = jax.lax.broadcasted_iota(jnp.int32, (8, b), 0)
        lod = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
        hi1 = (hid == hi).astype(jnp.float32)         # (8, b)
        lo1 = (lod == lo).astype(dt)                  # (n, b)
        hp = jnp.concatenate(
            [vals * hi1[h:h + 1, :] for h in range(8)], axis=0)  # (m, b)
        acc = acc + jax.lax.dot_general(
            hp.astype(dt), lo1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] += acc


def run(name, kernel, m, n, sub, dt, with_vals=False):
    nb = N_ROWS // BLK
    kern = functools.partial(kernel, m=m, n=n, sub=sub, dt=dt)
    slots = jnp.asarray(
        np.random.default_rng(0).integers(0, max(m // 8 * n, 2), N_ROWS),
        jnp.int32).reshape(N_ROWS // 128, 128)
    in_specs = [pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [slots]
    if with_vals:
        vals = jnp.ones((m // 8, N_ROWS), jnp.float32)
        in_specs.append(pl.BlockSpec((m // 8, BLK), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(vals)
    f = pl.pallas_call(
        kern, grid=(nb,),
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    r = f(*args)
    r.block_until_ready()
    np.asarray(r)  # force sync dispatch mode (timing trap)
    from scripts.xplane import module_times
    trace_dir = f"/tmp/micro_mxu_{abs(hash(name)) % 99999}"
    with jax.profiler.trace(trace_dir):
        f(*args).block_until_ready()
    dev_ms = sum(dur for _, dur in module_times(trace_dir)) / 1e3
    t = dev_ms / 1e3
    print(f"{name:44s} {dev_ms:8.2f} ms dev   {N_ROWS/t/1e9:7.2f} Grows/s",
          flush=True)


if __name__ == "__main__":
    run("dot f32 M=256 N=8 sub=8", dot_kernel, 256, 8, 8, jnp.float32)
    run("dot f32 M=128 N=32 sub=8", dot_kernel, 128, 32, 8, jnp.float32)
    run("dot bf16 M=128 N=32 sub=8", dot_kernel, 128, 32, 8, jnp.bfloat16)
    run("dot bf16 M=128 N=32 sub=1 (K=8192)", dot_kernel, 128, 32, 1, jnp.bfloat16)
    run("dot bf16 M=64 N=16 sub=1 (K=8192)", dot_kernel, 64, 16, 1, jnp.bfloat16)
    run("full onehot f32 M=72 N=32", onehot_kernel, 72, 32, 8, jnp.float32, True)
    run("full onehot bf16 M=72 N=32", onehot_kernel, 72, 32, 8, jnp.bfloat16, True)
