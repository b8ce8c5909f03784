"""Summarize a jax.profiler xplane trace: device-op time by HLO category.

Used for the round-3 MFU attribution (benchmarks/mfu_probe_r03.json +
benchmarks/trace_bs128): prints per-category totals and the top-N ops so
perf claims in DESIGN.md are reproducible from the committed trace.

    python tools/xplane_summary.py benchmarks/trace_bs128 [--top 20]

Parses the tsl xplane proto shipped inside the tensorflow package (no
tensorboard server needed).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_xspace(trace_dir: str):
    sys.path.insert(0, os.path.join(os.path.dirname(os.__file__),
                                    "site-packages", "tensorflow"))
    try:
        from tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # tf >= 2.16 moved tsl
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    xs, path = load_xspace(args.trace_dir)
    print(f"# {path}")
    planes = [p for p in xs.planes if "TPU" in p.name or "GPU" in p.name]
    if not planes:
        raise SystemExit("no device plane in trace")
    plane = planes[0]
    smeta = {k: v.name for k, v in plane.stat_metadata.items()}
    emeta = dict(plane.event_metadata.items())

    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        by_cat = collections.Counter()
        by_op = collections.Counter()
        n_events = 0
        for e in line.events:
            md = emeta[e.metadata_id]
            cat = None
            for s in md.stats:
                if smeta[s.metadata_id] in ("hlo_category", "category"):
                    cat = s.str_value
            for s in e.stats:
                if smeta[s.metadata_id] in ("hlo_category", "category"):
                    cat = s.str_value
            by_cat[cat or "?"] += e.duration_ps
            by_op[md.name] += e.duration_ps
            n_events += 1
        total = sum(by_cat.values())
        print(f"\n## device {plane.name}: {total / 1e9:.1f} ms busy, "
              f"{n_events} op executions")
        print("\n| HLO category | ms | % |\n|---|---|---|")
        for c, t in by_cat.most_common():
            if t / total < 0.001:
                continue
            print(f"| {c} | {t / 1e9:.2f} | {100 * t / total:.1f}% |")
        print(f"\ntop {args.top} ops:")
        for n, t in by_op.most_common(args.top):
            print(f"  {t / 1e9:8.2f} ms  {100 * t / total:5.1f}%  {n[:100]}")


if __name__ == "__main__":
    main()
