#!/usr/bin/env python
"""Device-utilization evidence from an xplane trace (VERDICT r2 item 6).

Parses the ``*.xplane.pb`` produced by ``jax.profiler.trace`` (e.g. via
``VFX_PROFILE_DIR=... scripts/phase_budget.py``) and reports, per TPU
device plane:

  * device-busy seconds (union of op-event intervals) vs the trace span,
  * the top op groups by summed duration (so the descriptor-GEMM share
    of device time is a number, not prose).

Usage: python scripts/utilization.py <profile_dir> [top_n]
"""

import collections
import glob
import json
import os
import sys


def _load_xspace(profile_dir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto location moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {profile_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace, paths[-1]


def _union_seconds(intervals):
    """Total covered length of [start, end) ps intervals, in seconds."""
    if not intervals:
        return 0.0
    intervals.sort()
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    total += cur_e - cur_s
    return total / 1e12


def main() -> None:
    profile_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    xspace, path = _load_xspace(profile_dir)

    out = {"trace": path, "devices": []}
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        # per-op-type stats (hlo_category, shape) live on the event
        # METADATA, not the events; leaf aggregation below excludes
        # control-flow containers so nested while/cond times don't
        # double-count (this is how the r3 descriptor-gather cost was
        # attributed — docs/DEVNOTES.md)
        sm = plane.stat_metadata
        ev_stats = {}
        for m_id, m in plane.event_metadata.items():
            d = {}
            for st in m.stats:
                d[sm[st.metadata_id].name] = (
                    st.str_value
                    or (sm[st.ref_value].name if st.ref_value else "")
                    or st.int64_value
                )
            ev_stats[m_id] = d
        intervals = []
        op_time = collections.Counter()
        mod_time = collections.Counter()
        cat_time = collections.Counter()
        leaf_time = collections.Counter()
        leaf_n = collections.Counter()
        span_lo, span_hi = None, 0
        for line in plane.lines:
            is_ops = line.name == "XLA Ops"
            is_mods = line.name == "XLA Modules"
            if not (is_ops or is_mods):
                continue
            for ev in line.events:
                s = line.timestamp_ns * 1000 + ev.offset_ps
                e = s + ev.duration_ps
                name = ev_meta.get(ev.metadata_id, "?")
                if is_mods:
                    mod_time[name.split("(")[0]] += ev.duration_ps
                    continue
                intervals.append((s, e))
                span_lo = s if span_lo is None else min(span_lo, s)
                span_hi = max(span_hi, e)
                # short name: lhs of the HLO text + the op kind
                short = name.split(" = ", 1)[0]
                kind = ""
                if " = " in name:
                    rhs = name.split(" = ", 1)[1]
                    kind = rhs.split("(", 1)[0].rsplit(" ", 1)[-1]
                op_time[f"{short} [{kind}]"] += ev.duration_ps
                stats = ev_stats.get(ev.metadata_id, {})
                cat = str(stats.get("hlo_category", ""))
                if cat not in ("while", "conditional", "call"):
                    cat_time[cat] += ev.duration_ps
                    shape = str(stats.get("shape_with_layout", ""))
                    lkey = f"{short} [{cat}] {shape.split('{')[0]}"
                    leaf_time[lkey] += ev.duration_ps
                    leaf_n[lkey] += 1
        if not intervals:
            continue
        busy_s = _union_seconds(intervals)
        span_s = (span_hi - span_lo) / 1e12
        top = [
            {"op": name, "s": round(ps / 1e12, 4),
             "pct_busy": round(100.0 * ps / 1e12 / busy_s, 1)}
            for name, ps in op_time.most_common(top_n)
        ]
        mods = [
            {"module": name, "s": round(ps / 1e12, 4)}
            for name, ps in mod_time.most_common(top_n)
        ]
        out["devices"].append({
            "plane": plane.name,
            "busy_s": round(busy_s, 4),
            "span_s": round(span_s, 4),
            "busy_pct_of_span": round(100.0 * busy_s / span_s, 1),
            "modules": mods,
            "top_ops": top,
            "leaf_by_category": [
                {"category": k, "s": round(v / 1e12, 4)}
                for k, v in cat_time.most_common(top_n)
            ],
            "top_leaf_ops": [
                {"op": k, "s": round(v / 1e12, 4), "n": leaf_n[k]}
                for k, v in leaf_time.most_common(2 * top_n)
            ],
        })
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
