"""Device-trace breakdown of the ex1 train step (VERDICT r2 next #2).

Captures a `jax.profiler` trace of the fully-jitted ex1 Burgers train
step (chained execution, so the traced window contains real device work,
not dispatch), parses the XSpace protobuf directly (the
tensorboard-plugin-profile converter is incompatible with the installed
TF stub), and prints:

  * honest step time (chained two-point slope, utils/profiling.measure)
  * top-k device ops by self time with % of device total
  * total device busy time vs wall -> what the 1 ms step actually spends
  * batch-size scaling rows

Usage:
  python eval/trace_ex1_step.py [--bf16] [--batches 8 16 32 64]
      [--out eval/trace_ex1.json]
"""
import argparse
import glob
import json
import os
import sys
import tempfile
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GRID = 2048


def build_step(batch_size: int, bf16: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config

    cfg = load_config("ex1_burgers", path=os.path.join(REPO, "config.yml"))
    cfg["attention_type"] = "galerkin"
    if bf16:
        cfg["dtype"] = jnp.bfloat16
    model = SimpleTransformer.from_config(cfg)

    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 1)),
                       jnp.float32)
    edge = jnp.ones((batch_size, 1), jnp.float32)
    pos = jnp.linspace(0, 1, N_GRID, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (batch_size, N_GRID, 1))
    target = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 2)),
                         jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, edge, pos, pos)["params"]
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=1.0 / N_GRID, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1.0 / N_GRID), tx, donate=False)
    return train_step, (params, opt_state, batch, jax.random.key(0))


def _op_category(name: str) -> str:
    """Coarse HLO op class for the rollup (async copies overlap compute,
    so their self-time is an upper bound on exposed latency)."""
    if name.startswith(("%copy-start", "%copy-done", "%slice-start",
                        "%slice-done", "%dynamic-update-slice-start",
                        "%dynamic-update-slice-done", "%copy.")):
        return "copy/async"
    if "convolution" in name or "%dot" in name or name.startswith("%cudnn"):
        return "matmul/conv"
    if name.startswith("%fft"):
        return "fft"
    if name.startswith("%fusion") or name.startswith("%loop_fusion") or \
            name.startswith("%input_fusion") or name.startswith("%output_fusion"):
        return "fusion"
    if name.startswith(("%while", "jit_", "0")):
        return "wrapper"
    return "other"


def parse_xspace(trace_dir: str, top_k: int = 40):
    """Aggregate device-plane op self-times from the raw xplane protobuf."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        return None
    sp = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        sp.ParseFromString(f.read())

    device_planes = [p for p in sp.planes
                     if "TPU" in p.name or "/device:" in p.name.upper()
                     or p.name.startswith("/device")]
    if not device_planes:
        # CPU runs name the device plane '/host:CPU'
        device_planes = [p for p in sp.planes if "CPU" in p.name]
    result = []
    for plane in device_planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()} if \
            hasattr(plane.event_metadata, "values") else {}
        if not meta:
            meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0.0, 0])
        span = [float("inf"), 0.0]
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                agg[name][0] += dur
                agg[name][1] += 1
                t0 = line.timestamp_ns / 1e9 + ev.offset_ps / 1e12
                span[0] = min(span[0], t0)
                span[1] = max(span[1], t0 + dur)
        total = sum(v[0] for v in agg.values())
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_k]
        cats = defaultdict(lambda: [0.0, 0])
        for name, (t, c) in agg.items():
            cat = _op_category(name)
            cats[cat][0] += t
            cats[cat][1] += c
        result.append(dict(
            plane=plane.name,
            device_busy_s=round(total, 6),
            span_s=round(span[1] - span[0], 6) if agg else 0.0,
            categories={k: dict(self_time_s=round(t, 6), count=c,
                                pct=round(100 * t / total, 2))
                        for k, (t, c) in sorted(cats.items(),
                                                key=lambda kv: -kv[1][0])},
            top_ops=[dict(op=name, self_time_s=round(t, 6), count=c,
                          pct=round(100 * t / total, 2))
                     for name, (t, c) in rows]))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*", default=[8])
    ap.add_argument("--trace-iters", type=int, default=50)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--task", type=str, default="ex1",
                    choices=("ex1", "ex2"),
                    help="ex1 = 1D Burgers step (n=2048); ex2 = 2D Darcy "
                         "step (141² fine / 43² coarse, d=128)")
    ap.add_argument("--trace-batch", type=int, default=None,
                    help="which batch size to capture the device trace at "
                         "(default: the first of --batches)")
    ap.add_argument("--precision", type=str, default=None,
                    choices=("default", "high", "highest"))
    args = ap.parse_args()

    import jax
    from galerkin_transformer_tpu.utils.jax_setup import setup
    from galerkin_transformer_tpu.utils.profiling import measure, \
        _chained_runner

    setup(precision=args.precision
          or ("high" if args.bf16 else "highest"))
    report = dict(backend=jax.default_backend(),
                  device=jax.devices()[0].device_kind,
                  bf16=args.bf16, task=args.task,
                  n_grid=N_GRID if args.task == "ex1" else 141, rows=[])
    trace_at = args.trace_batch or args.batches[0]

    for bsz in args.batches:
        if args.task == "ex2":
            import bench
            _, step, sargs = bench.bench_ours_2d(batch_size=bsz,
                                                 bf16=args.bf16,
                                                 build_only=True)
        else:
            step, sargs = build_step(bsz, args.bf16)
        dt = measure(step, *sargs, iters=30, iters_lo=10)
        pts = bsz * (N_GRID if args.task == "ex1" else 141 * 141)
        row = dict(batch=bsz, step_ms=round(dt * 1e3, 4),
                   grid_points_per_s=round(pts / dt, 1))
        print(f"bsz {bsz}: {row['step_ms']} ms/step "
              f"({row['grid_points_per_s']:.3g} pts/s)", flush=True)

        if bsz == trace_at:
            # trace the chained loop so the window contains real execution
            runner = _chained_runner(step)
            import jax.numpy as jnp
            n = jnp.asarray(args.trace_iters)
            runner(n, sargs)  # compile outside the trace
            tdir = tempfile.mkdtemp(prefix="ex1trace_")
            try:
                with jax.profiler.trace(tdir):
                    out = runner(n, sargs)
                    jax.block_until_ready(out)
                    # force completion: fetch one element
                    jax.device_get(jax.tree_util.tree_leaves(out)[0])
                row["trace"] = parse_xspace(tdir)
            except Exception as e:
                row["trace_error"] = repr(e)
            if row.get("trace"):
                for plane in row["trace"]:
                    print(f"-- plane {plane['plane']}: busy "
                          f"{plane['device_busy_s'] * 1e3:.2f} ms over "
                          f"{args.trace_iters} iters "
                          f"({plane['device_busy_s'] / args.trace_iters * 1e3:.3f} ms/step)")
                    for op in plane["top_ops"][:15]:
                        print(f"   {op['pct']:6.2f}%  {op['count']:>6}x  "
                              f"{op['op'][:90]}")
            elif "trace_error" in row:
                print("trace failed:", row["trace_error"])
        report["rows"].append(row)

    out = args.out or os.path.join(
        REPO, "eval",
        f"trace_{args.task}{'_bf16' if args.bf16 else ''}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
