"""Parse a jax.profiler xplane.pb into per-op device durations.

Usage as a module:
    from scripts.xplane import profile_device_ops
    ops = profile_device_ops(trace_dir)   # [(name, total_us, count), ...]

The device planes of the xplane proto hold the TPU kernel timeline; the
durations there are measured on-device and are trustworthy even through
the axon dev tunnel (CLAUDE.md "TIMING TRAP").
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict


def _load_xplane(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def find_xplane_files(trace_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)


def profile_device_ops(trace_dir: str, merge_scopes: bool = False):
    """Aggregate device-plane events: returns (ops, total_device_us).

    ops = list of (event_name, total_us, count) sorted by total_us desc.
    total_device_us = busy time summed over the main device line.
    """
    files = find_xplane_files(trace_dir)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = _load_xplane(files[-1])
    agg: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])
    total_ps = 0
    for plane in xspace.planes:
        name = plane.name
        if "TPU" not in name and "/device:" not in name:
            continue
        # XLA Modules / XLA Ops / XLA TraceMe lines live on device planes
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name
            if lname not in ("XLA Ops", "XLA Modules", "Steps"):
                # prefer the op-level line; skip others
                if lname != "XLA Ops":
                    continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                nm = md.name if md else f"op{ev.metadata_id}"
                us = ev.duration_ps / 1e6
                if lname == "XLA Ops":
                    key = nm
                    if merge_scopes:
                        key = nm.split(".")[0]
                    agg[key][0] += us
                    agg[key][1] += 1
                elif lname == "XLA Modules":
                    total_ps += ev.duration_ps
    ops = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                 key=lambda t: -t[1])
    return ops, total_ps / 1e6


def module_times(trace_dir: str):
    """Per-XLA-module (compiled program) device durations, in order."""
    files = find_xplane_files(trace_dir)
    xspace = _load_xplane(files[-1])
    out = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                nm = md.name if md else str(ev.metadata_id)
                out.append((nm, ev.offset_ps / 1e6, ev.duration_ps / 1e6))
    out.sort(key=lambda t: t[1])
    return [(nm, dur) for nm, _, dur in out]


def print_report(trace_dir: str, top: int = 40):
    ops, total_us = profile_device_ops(trace_dir)
    mods = module_times(trace_dir)
    print(f"== modules ({len(mods)}) ==")
    for nm, dur in mods:
        print(f"  {dur/1e3:10.3f} ms  {nm[:90]}")
    print(f"== top ops (device) ==")
    shown = 0.0
    for nm, us, cnt in ops[:top]:
        shown += us
        print(f"  {us/1e3:10.3f} ms  x{cnt:<5d} {nm[:90]}")
    rest = sum(us for _, us, _ in ops[top:])
    print(f"  {rest/1e3:10.3f} ms  (other {max(0, len(ops)-top)} ops)")


if __name__ == "__main__":
    import sys
    print_report(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 40)
