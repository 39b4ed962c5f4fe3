"""Partitioned device tables: rows sharded across the mesh.

≙ the reference's data-placement layer, which pins one whole table per
worker by a table-name hash (/root/reference/crates/coordinator/src/
distributed_planner.rs:152-157 — explicitly not partition-parallel).
Here every table is row-partitioned across ALL devices of the slice
(BASELINE north star): columns are (P, cap_per_part) arrays with a
NamedSharding over the `d` axis, so each device holds exactly its shard
in HBM. String dictionaries stay global (codes partition with rows).

Partitioning modes:
- block (default): contiguous equal splits — perfect for scans.
- hash(key): rows placed by key hash % P — joins/aggregates on that key
  skip their shuffle entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..table import PAD, Column, DeviceTable, pad_count
from ..dtypes import SqlType
from .mesh import global_get, row_sharding


def _mix64_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


@dataclasses.dataclass
class PartCol:
    data: jax.Array                     # (P, cap); (cap,) on a P==1 mesh
    valid: Optional[jax.Array]          # same shape as data, or None
    dtype: SqlType
    dictionary: Optional[np.ndarray] = None
    stats: Optional[tuple] = None       # (min, max) for integer columns
    pair_hi: Optional[jax.Array] = None  # paired-int32 INT64 hi plane


class PartitionedTable:
    def __init__(self, cols: dict[str, PartCol], counts: jax.Array,
                 mesh, nrows: int):
        self.cols = cols
        self.counts = counts                # (P,) rows per partition
        self.mesh = mesh
        self.nrows = nrows
        self.counts_host = None             # np copy when already pulled
        # name of the integer column each shard is physically sorted by
        # (cluster_by below) — joins on it skip the probe-side lax.sort
        self.clustered_by: Optional[str] = None
        self.cluster_stride: int = 1

    @property
    def num_parts(self) -> int:
        return self.counts.shape[0]

    @property
    def cap_per_part(self) -> int:
        return next(iter(self.cols.values())).data.shape[-1]

    def schema(self):
        return [(n, c.dtype) for n, c in self.cols.items()]

    @classmethod
    def from_device_table(cls, dt: DeviceTable, mesh,
                          hash_key: Optional[str] = None) -> "PartitionedTable":
        """Partition a single-device table across the mesh."""
        P = int(np.prod(mesh.devices.shape))
        n = dt.nrows
        if P == 1:
            # trivial mesh: keep columns flat (cap,) — a (1, cap) view
            # forces a T(1,128)→T(1024) relayout copy (~2 ms / 100M col)
            # inside every fragment program that squeezes it back
            cols1 = {
                name: PartCol(
                    data=c.data, dtype=c.dtype,
                    valid=c.validity,
                    dictionary=c.dictionary, stats=getattr(c, "stats", None),
                    pair_hi=getattr(c, "pair_hi", None))
                for name, c in dt.columns.items()
            }
            import jax.numpy as _jnp
            counts1 = _jnp.asarray([n], dtype=_jnp.int32)
            return cls(cols1, counts1, mesh, n)

        # host-side row assignment (paired int64 columns materialize
        # here — multi-shard tables hold 1/P of the rows each)
        def _host_data(c):
            d = np.asarray(jax.device_get(c.data))[:n]
            hi = getattr(c, "pair_hi", None)
            if hi is not None:
                h = np.asarray(jax.device_get(hi))[:n]
                return ((h.astype(np.int64) << 32)
                        | (d.view(np.uint32).astype(np.int64)))
            return d

        host_cols = {name: _host_data(c)
                     for name, c in dt.columns.items()}
        host_valid = {name: (np.asarray(jax.device_get(c.validity))[:n]
                             if c.validity is not None else None)
                      for name, c in dt.columns.items()}

        if hash_key is not None:
            key = host_cols[hash_key]
            if key.dtype.kind == "f":
                bits = key.astype(np.float64).view(np.uint64)
            else:
                bits = key.astype(np.int64).view(np.uint64)
            dest = (_mix64_np(bits) % np.uint64(P)).astype(np.int64)
            order = np.argsort(dest, kind="stable")
            part_counts = np.bincount(dest, minlength=P)
        else:
            base, rem = divmod(n, P)
            part_counts = np.full(P, base, dtype=np.int64)
            part_counts[:rem] += 1
            order = np.arange(n)

        cap = pad_count(int(part_counts.max()) if n else PAD)
        offsets = np.concatenate([[0], np.cumsum(part_counts)])

        sharding = row_sharding(mesh)
        out_cols: dict[str, PartCol] = {}
        for name, c in dt.columns.items():
            vals = host_cols[name][order]
            data = np.zeros((P, cap), dtype=vals.dtype)
            valid_np = host_valid[name]
            v = valid_np[order] if valid_np is not None else None
            vbuf = np.zeros((P, cap), dtype=np.bool_) if v is not None else None
            for p in range(P):
                s, e = offsets[p], offsets[p + 1]
                data[p, : e - s] = vals[s:e]
                if vbuf is not None:
                    vbuf[p, : e - s] = v[s:e]
            out_cols[name] = PartCol(
                data=jax.device_put(jnp.asarray(data), sharding),
                valid=(jax.device_put(jnp.asarray(vbuf), sharding)
                       if vbuf is not None else None),
                dtype=c.dtype, dictionary=c.dictionary,
                stats=getattr(c, "stats", None))

        from jax.sharding import NamedSharding, PartitionSpec
        counts = jax.device_put(jnp.asarray(part_counts, dtype=jnp.int32),
                                NamedSharding(mesh, PartitionSpec("d")))
        return cls(out_cols, counts, mesh, n)

    def cluster_by(self, key: str) -> None:
        """Physically sort each shard's rows by integer column `key`
        (in place; row order is semantically free in SQL). Afterwards the
        sorted bitmap-window join probe (dist_exec._dense_sorted_probe)
        skips its per-query probe-side lax.sort — the single largest cost
        of repeated fact⋈dim joins (~81% of the SF10 join).

        Physical layout is engine-owned — the reference just streams
        whatever is stored (/root/reference/crates/engine/src/operators/
        parquet_scan.rs:46-82); clustering is our analog of its roadmap
        'storage optimization'. Layout invariants established here (the
        probe path relies on them):
        - alive rows stay a prefix (counts unchanged); null-key rows sort
          to the END of the alive prefix,
        - the stored key data is monotone nondecreasing over the WHOLE
          cap array: null-key rows and the dead tail are rewritten to the
          max alive valid key (data under nulls/padding is unspecified,
          so this is free) — a clipped slot id computed from any row then
          stays monotone and window-local.
        Shard-local (no collectives); hash placement is preserved."""
        if self.clustered_by == key:
            return
        kc = self.cols.get(key)
        if kc is None or not kc.dtype.is_integer:
            raise ValueError(f"cluster_by: {key!r} is not an integer column")
        names = list(self.cols)
        cap = self.cap_per_part
        P = self.num_parts
        has_hi = {n: self.cols[n].pair_hi is not None for n in names}
        has_v = {n: self.cols[n].valid is not None for n in names}

        def shard_sort(count, *planes):
            it = iter(planes)
            per = {}
            for n in names:
                d = next(it)
                h = next(it) if has_hi[n] else None
                v = next(it) if has_v[n] else None
                per[n] = (d, h, v)
            kd, kh, kv = per[key]
            from ..table import combine_pair64 as _c64
            k64 = _c64(kd, kh) if kh is not None else kd.astype(jnp.int64)
            alive = jnp.arange(cap) < count
            okv = alive if kv is None else (alive & kv)
            mx64 = jnp.int64(2**63 - 1)
            sk = jnp.where(okv, k64, jnp.where(alive, mx64 - 1, mx64))
            operands = [sk]
            slots = []                      # (name, kind) per payload plane
            for n in names:
                d, h, v = per[n]
                if n != key:
                    operands.append(d)
                    slots.append((n, "data"))
                    if h is not None:
                        operands.append(h)
                        slots.append((n, "hi"))
                if v is not None:
                    operands.append(v)
                    slots.append((n, "valid"))
            srt = jax.lax.sort(operands, num_keys=1, is_stable=False)
            ssk = srt[0]
            nvalid = jnp.sum(okv.astype(jnp.int32))
            top = ssk[jnp.clip(nvalid - 1, 0, cap - 1)]
            top = jnp.where(nvalid > 0, top, jnp.int64(0))
            newk = jnp.where(jnp.arange(cap) < nvalid, ssk, top)
            outs = {}
            if kh is not None:
                w = jax.lax.bitcast_convert_type(newk, jnp.int32)
                outs[(key, "data")] = w[..., 0]
                outs[(key, "hi")] = w[..., 1]
            else:
                outs[(key, "data")] = newk.astype(kd.dtype)
            for tag, arr in zip(slots, srt[1:]):
                outs[tag] = arr
            order = [(key, "data")] + ([(key, "hi")] if has_hi[key] else [])
            order += slots
            return tuple(outs[t] for t in order)

        in_planes = []
        for n in names:
            c = self.cols[n]
            in_planes.append(c.data)
            if has_hi[n]:
                in_planes.append(c.pair_hi)
            if has_v[n]:
                in_planes.append(c.valid)

        flat = in_planes[0].ndim == 1
        if flat:
            outs = jax.jit(shard_sort)(self.counts[0], *in_planes)
        else:
            from jax.sharding import PartitionSpec as PS
            nsp = len(in_planes)

            def wrapped(count, *planes):
                res = shard_sort(count[0], *[p[0] for p in planes])
                return tuple(o[None] for o in res)

            sm = jax.shard_map(
                wrapped, mesh=self.mesh,
                in_specs=(PS("d"),) + (PS("d", None),) * nsp,
                out_specs=(PS("d", None),) * nsp,
                check_vma=False)
            outs = jax.jit(sm)(self.counts, *in_planes)

        it = iter(outs)
        kcol = self.cols[key]
        kcol.data = next(it)
        if has_hi[key]:
            kcol.pair_hi = next(it)
        for n in names:
            c = self.cols[n]
            if n != key:
                c.data = next(it)
                if has_hi[n]:
                    c.pair_hi = next(it)
            if has_v[n]:
                c.valid = next(it)
        self.clustered_by = key
        self.cluster_stride = self._detect_stride(key)

    def _detect_stride(self, key: str) -> int:
        """Largest power-of-2 dividing every valid (key − lo): sparse
        surrogate keys (TPC-H o_orderkey·4 shapes) then probe a
        stride-compressed slot space — the bitmap-window walk cost is
        proportional to the window row count, so a stride of 4 makes
        the dense probes up to 4× cheaper. ONE OR-fold over the stored
        column + a single host scalar read; exact by construction
        (lowest set bit of the OR of all offsets)."""
        kc = self.cols[key]
        if kc.stats is None:
            return 1
        lo = int(kc.stats[0])

        def orfold(data, hi, valid, counts):
            from ..table import combine_pair64 as _c64
            k64 = _c64(data, hi) if hi is not None \
                else data.astype(jnp.int64)
            cap = k64.shape[-1]
            alive = jnp.arange(cap) < counts[..., None] if k64.ndim > 1 \
                else jnp.arange(cap) < counts
            ok = alive if valid is None else (alive & valid)
            d = jnp.where(ok, k64 - lo, 0).reshape(-1)
            # log-fold OR (lax.reduce with a custom computation is
            # unimplemented on some backends)
            m = d.shape[0]
            while m > 1:
                h = (m + 1) // 2
                d = jnp.bitwise_or(
                    d[:h], jnp.pad(d[h:m], (0, 2 * h - m)))
                m = h
            return d[0]

        flat = kc.data.ndim == 1
        counts = self.counts[0] if flat else self.counts
        orv = int(jax.device_get(jax.jit(orfold)(
            kc.data, kc.pair_hi, kc.valid, counts)))
        if orv <= 0:
            return 1
        return orv & (-orv)

    def to_device_table(self) -> DeviceTable:
        """Gather all partitions into a single (host-ordered) table."""
        if self.num_parts == 1:
            # trivial mesh: columns are stored flat (cap,) — zero-copy
            # wrap; reuse the already-pulled count when the fragment
            # runner fetched it (saves a ~25 ms tunnel round trip)
            ch = self.counts_host
            total = int((ch if ch is not None
                         else np.asarray(jax.device_get(self.counts)))[0])
            columns = {
                name: Column(data=c.data, dtype=c.dtype, validity=c.valid,
                             dictionary=c.dictionary)
                for name, c in self.cols.items()
            }
            return DeviceTable(columns, total)
        counts = (self.counts_host if self.counts_host is not None
                  else global_get(self.counts))
        P = len(counts)
        total = int(counts.sum())
        cap = pad_count(max(total, 1))
        columns = {}
        for name, c in self.cols.items():
            data = global_get(c.data)
            out = np.zeros((cap,), dtype=data.dtype)
            pos = 0
            vout = None
            vdata = global_get(c.valid) if c.valid is not None else None
            if vdata is not None:
                vout = np.zeros((cap,), dtype=np.bool_)
            for p in range(P):
                k = counts[p]
                out[pos:pos + k] = data[p, :k]
                if vout is not None:
                    vout[pos:pos + k] = vdata[p, :k]
                pos += k
            columns[name] = Column(
                data=jnp.asarray(out), dtype=c.dtype,
                validity=jnp.asarray(vout) if vout is not None else None,
                dictionary=c.dictionary)
        return DeviceTable(columns, total)
