"""Offline XSpace parser: per-LINE aggregation of a jax.profiler trace.

The quick in-run parser in trace_ex1_step.py summed events across every
line of the device plane — XLA traces are hierarchical (module > op >
trace-me levels), so that overcounts by the nesting depth.  This tool
aggregates each line separately and reports the leaf op line ("XLA Ops"
when present, else the busiest line), which is the defensible per-op
breakdown.

Usage: python eval/parse_trace.py /tmp/ex1trace_*/ [--iters 50] [--top 20]
"""
import argparse
import glob
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse(trace_dir, top=20, iters=None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        sp.ParseFromString(f.read())

    out = []
    for plane in sp.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name and \
                "CPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        lines = []
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e12
                agg[name][1] += 1
            total = sum(v[0] for v in agg.values())
            lines.append((line.name, total, agg))
        if not lines:
            continue
        # leaf ops line: 'XLA Ops' if present, else the line with the most
        # distinct events (modules line has few huge events)
        named = {n: (t, a) for n, t, a in lines}
        leaf = None
        for key in named:
            if "op" in key.lower() and "module" not in key.lower():
                leaf = key
                break
        if leaf is None:
            leaf = max(lines, key=lambda x: len(x[2]))[0]
        total, agg = named[leaf]
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        out.append(dict(
            plane=plane.name, line=leaf,
            lines={n: round(t * 1e3, 3) for n, t, _ in lines},
            device_busy_ms=round(total * 1e3, 3),
            per_iter_ms=(round(total * 1e3 / iters, 4) if iters else None),
            top_ops=[dict(op=name[:120], ms=round(t * 1e3, 3), count=c,
                          pct=round(100 * t / total, 2))
                     for name, (t, c) in rows]))
    return out


def classify(op_name):
    n = op_name.lower()
    if "copy" in n:
        return "copy/prefetch"
    if any(k in n for k in ("dot", "conv", "fusion.dot")):
        return "matmul/conv"
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dirs", nargs="+")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    report = {}
    for d in args.trace_dirs:
        planes = parse(d, top=args.top, iters=args.iters)
        report[d] = planes
        for p in planes:
            if "TPU" not in p["plane"]:
                continue
            print(f"== {d} {p['plane']} line={p['line']!r}: "
                  f"busy {p['device_busy_ms']:.1f} ms "
                  f"({p['per_iter_ms']} ms/iter)")
            groups = defaultdict(float)
            for op in p["top_ops"]:
                groups[classify(op["op"])] += op["ms"]
            for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
                print(f"   [{g}] {ms:.2f} ms")
            for op in p["top_ops"]:
                print(f"   {op['pct']:6.2f}% {op['count']:>6}x "
                      f"{op['ms']:8.2f}ms  {op['op'][:100]}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
