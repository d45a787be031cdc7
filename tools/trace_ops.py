"""Summarise a jax.profiler.trace into a device-op cost table.

    python tools/profile.py --config config4 --batched 64 --out /tmp/tr
    python tools/trace_ops.py /tmp/tr [--top 25]

Walks the trace's xplane protos (via tensorflow's xplane_pb2), finds the
device plane(s), and prints total/self time per op name plus per-line
totals — the table that drives PERF.md's "profile → kernel → measure"
loop (VERDICT r3 item 2: re-profile after each shipped kernel)."""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os


def load_xplanes(trace_dir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    spaces = []
    for p in sorted(paths)[-1:]:        # newest run only
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarize(trace_dir: str, top: int = 25):
    out = {"trace": trace_dir, "planes": []}
    for path, xs in load_xplanes(trace_dir):
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            per_line = []
            for line in plane.lines:
                by_op = collections.Counter()
                total = 0
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    by_op[name] += ev.duration_ps
                    total += ev.duration_ps
                if not by_op:
                    continue
                per_line.append({
                    "line": line.name,
                    "total_ms": round(total / 1e9, 3),
                    "events": len(line.events),
                    "top_ops": [
                        {"op": k, "ms": round(v / 1e9, 3),
                         "pct": round(100.0 * v / total, 1)}
                        for k, v in by_op.most_common(top)],
                })
            if per_line:
                out["planes"].append({"plane": plane.name,
                                      "file": os.path.basename(path),
                                      "lines": per_line})
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    rep = summarize(args.trace_dir, args.top)
    if args.json:
        print(json.dumps(rep, indent=2))
        return 0
    for plane in rep["planes"]:
        print(f"== {plane['plane']} ({plane['file']})")
        for line in plane["lines"]:
            print(f"-- line {line['line']}: {line['total_ms']} ms, "
                  f"{line['events']} events")
            for row in line["top_ops"]:
                print(f"   {row['ms']:>9.3f} ms  {row['pct']:>5.1f}%  "
                      f"{row['op']}")
    return 0


if __name__ == "__main__":
    main()
