#!/usr/bin/env python
"""Aggregate device-op time from a JAX profiler ``*.xplane.pb``.

The Perfetto JSON export (`*.trace.json.gz`) truncates at 1M events and the
axon tunnel's host chatter alone exceeds that, crowding every device op out
of the JSON (observed: 1,000,000 host events, 0 device events).  The XSpace
protobuf has no such cap — parse it directly.

Usage: python scripts/xplane.py <trace_dir_or_pb> [--top N] [--by-category]
"""
from __future__ import annotations

import glob
import sys
from collections import defaultdict


def _load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if not path.endswith(".pb"):
        cands = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
        if not cands:
            raise FileNotFoundError(f"no *.xplane.pb under {path}")
        path = cands[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(path: str, include_async: bool = False):
    """Return (totals_ms, counts, meta) summed over device-plane XLA Ops.

    totals_ms/counts are keyed by op name; meta maps op name -> the
    'tf_op'/'hlo_category' stat string when present (helps bucket fusions).

    Only the synchronous ``XLA Ops`` line is summed by default: the
    ``Async XLA Ops`` line reports in-flight DMA durations that OVERLAP
    compute, so adding them (the old ``"XLA Ops" in line.name`` substring
    match did) double-counts and drowns the real budget in prefetch
    slice/copy-starts.  Pass ``include_async=True`` for the merged view.
    """
    xs = _load_xspace(path)
    totals = defaultdict(float)
    counts = defaultdict(int)
    meta: dict[str, str] = {}
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops" and not (
                    include_async and line.name == "Async XLA Ops"):
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                name = md.name
                totals[name] += ev.duration_ps / 1e9  # ps -> ms
                counts[name] += 1
                if name not in meta:
                    for st in ev.stats:
                        if stat_md.get(st.metadata_id) == "hlo_category":
                            sv = st.str_value or stat_md.get(
                                st.ref_value, "")
                            meta[name] = sv
    return dict(totals), dict(counts), meta


def busy_report(path: str):
    """Print sync-line busy time and the largest execution gaps.

    The sync ``XLA Ops`` line is a single serial timeline on a TPU core;
    ``span - busy`` is true device idle (pipeline bubbles).  Outer
    ``while`` ops span their whole body and are excluded.
    """
    xs = _load_xspace(path)
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                if name.startswith("%while"):
                    continue
                evs.append((ev.offset_ps, ev.duration_ps, name))
            if not evs:
                continue
            evs.sort()
            span = (max(o + d for o, d, _ in evs) - evs[0][0]) / 1e9
            busy = sum(d for _, d, _ in evs) / 1e9
            gaps = []
            cur_end, prev = evs[0][0], ""
            for o, d, n in evs:
                if o > cur_end:
                    gaps.append((o - cur_end, prev, n))
                if o + d > cur_end:
                    cur_end, prev = o + d, n
            gaps.sort(reverse=True)
            print(f"[xplane] {plane.name}: span {span:.2f} ms, busy "
                  f"{busy:.2f} ms, idle {span - busy:.3f} ms "
                  f"({100 * (span - busy) / max(span, 1e-9):.2f}%)",
                  file=sys.stderr)
            for g, a, b in gaps[:10]:
                print(f"[xplane]   gap {g / 1e9:7.3f} ms  "
                      f"{a[:45]} -> {b[:45]}", file=sys.stderr)


def print_top(path: str, top: int = 40, by_category: bool = False):
    totals, counts, meta = device_op_totals(path)
    grand = sum(totals.values())
    print(f"[xplane] total device-op time {grand:.2f} ms "
          f"across {sum(counts.values())} events", file=sys.stderr)
    if by_category:
        cat = defaultdict(float)
        for name, d in totals.items():
            cat[meta.get(name, "?")] += d
        for c, d in sorted(cat.items(), key=lambda kv: -kv[1]):
            print(f"[xplane] {d:9.3f} ms  {100*d/grand:5.1f}%  {c}",
                  file=sys.stderr)
        return
    for name, d in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        c = meta.get(name, "")
        print(f"[xplane] {d:9.3f} ms  x{counts[name]:<5} "
              f"[{c[:18]:<18}] {name[:100]}", file=sys.stderr)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
        args = [a for a in args if a != str(top)]
    if "--busy" in sys.argv:
        busy_report(args[0])
    else:
        print_top(args[0], top=top, by_category="--by-category" in sys.argv)
