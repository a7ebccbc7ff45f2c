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
            top_ops=[dict(op=name, ms=round(t * 1e3, 3), count=c,
                          pct=round(100 * t / total, 2))
                     for name, (t, c) in rows]))
    return out


_DTYPE_BYTES = dict(f64=8, f32=4, f16=2, bf16=2, s32=4, u32=4, s8=1, u8=1,
                    pred=1, c64=8, c128=16, s64=8, u64=8, s16=2, u16=2)
_SHAPE_RE = None


def op_bytes(op_text):
    """(hbm_bytes, vmem_bytes) summed over every shape literal in an HLO
    op string — result plus all operands that appear in the text.

    The layout annotation carries the memory space: `{...S(1)}` = VMEM
    (space 1), no S(...) = HBM (space 0).  Splitting on it turns the op
    text into a defensible per-op HBM-traffic estimate — XLA keeps much
    of the working set VMEM-resident, which is exactly what the r2
    'bytes accessed = 274% of HBM peak' cost-analysis proxy could not
    distinguish."""
    global _SHAPE_RE
    import re
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(
            r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]"
            r"(\{[^}]*\})?")
    hbm = vmem = 0
    for dt, dims, layout in _SHAPE_RE.findall(op_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * _DTYPE_BYTES[dt]
        if "S(" in layout and "S(0)" not in layout:
            vmem += b
        else:
            hbm += b
    return hbm, vmem


def roofline_table(plane_dict, iters, hbm_gb_s=819.0, top=12):
    """Per-op: measured time vs bytes/BW floor — memory-bound ops sit
    near 100%."""
    rows = []
    tot_hbm = tot_time = 0.0
    for op in plane_dict["top_ops"]:
        if op["count"] < iters:  # skip the while wrapper / one-offs
            continue
        hbm, vmem = op_bytes(op["op"])
        per_iter_us = op["ms"] * 1e3 / op["count"]
        floor_us = hbm / (hbm_gb_s * 1e9) * 1e6
        tot_hbm += hbm
        tot_time += per_iter_us
        rows.append(dict(op=op["op"][:80], us=round(per_iter_us, 2),
                         hbm_kb=round(hbm / 1024, 1),
                         vmem_kb=round(vmem / 1024, 1),
                         floor_us=round(floor_us, 2),
                         bw_util_pct=(round(100 * floor_us / per_iter_us, 1)
                                      if per_iter_us else None)))
    summary = dict(listed_ops_us=round(tot_time, 2),
                   listed_hbm_mb=round(tot_hbm / 2**20, 2),
                   listed_effective_gb_s=round(
                       tot_hbm / (tot_time * 1e-6) / 1e9, 1)
                   if tot_time else None)
    return rows[:top], summary


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
    ap.add_argument("--roofline", action="store_true",
                    help="per-op bytes/BW floor vs measured time")
    ap.add_argument("--hbm-gb-s", type=float, default=819.0)
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
            if args.roofline:
                rows, summ = roofline_table(p, args.iters, args.hbm_gb_s)
                p["roofline"] = rows
                p["roofline_summary"] = summ
                print(f"   -- per-op HBM roofline "
                      f"(floor = HBM-space bytes/{args.hbm_gb_s:.0f} GB/s):")
                for r in rows:
                    print(f"   {r['us']:8.2f}us vs floor "
                          f"{r['floor_us']:6.2f}us "
                          f"({r['bw_util_pct']}% of HBM BW) "
                          f"hbm {r['hbm_kb']:9.1f}KB vmem "
                          f"{r['vmem_kb']:9.1f}KB  {r['op'][:55]}")
                print(f"   -- listed ops: {summ['listed_ops_us']}us, "
                      f"{summ['listed_hbm_mb']} MB HBM -> "
                      f"{summ['listed_effective_gb_s']} GB/s effective")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
