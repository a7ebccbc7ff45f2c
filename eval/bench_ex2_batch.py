"""ex2 Darcy 2D train-step batch-scaling sweep (VERDICT r4 item 1).

The round-4 trace showed the ex2 step at bsz 4 is bound by per-step
HBM->VMEM weight re-streaming (docs/PERFORMANCE.md "ex2 2D train step").
Weight traffic is per-STEP, so a larger monolithic batch amortizes it
per-sample — exactly where the 1D (n=2048) step could not benefit because
its activations already dominated.  This sweep measures the full jitted
FourierTransformer2D train step (141² fine / 43² coarse, d=128, bf16
encoder + bf16 conv scalers, high matmul precision) at bsz 4/8/16/32/64
monolithic, plus microbatch-accumulation variants at the larger sizes,
and records fine-grid points/s + MFU for each point.

Reference context: the torch reference was capped at bsz<=2-4 by GPU VRAM
(/root/reference/examples/README.md:14,214); peak temp here at bsz 4 is
1.08 GB on a ~16 GB chip, so the batch axis is wide open.

Writes eval/ex2_batch_scaling.json and prints the table.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "high")

from bench import _roofline, bench_ours_2d  # noqa: E402

N_FINE = 141


def main():
    rows = []
    configs = [
        # (batch_size, accum_steps)
        (4, 1),
        (8, 1),
        (16, 1),
        (32, 1),
        (64, 1),
        (32, 4),
        (64, 8),
    ]
    if "--quick" in sys.argv:
        configs = [(4, 1), (16, 1)]
    for bsz, accum in configs:
        try:
            dt, step, args = bench_ours_2d(batch_size=bsz,
                                           accum_steps=accum)
        except Exception as e:  # OOM at some bsz is a result, not a crash
            rows.append(dict(bsz=bsz, accum=accum,
                             error=f"{type(e).__name__}: {e}"[:300]))
            print(f"bsz={bsz} accum={accum}: FAILED {type(e).__name__}",
                  flush=True)
            continue
        row = dict(bsz=bsz, accum=accum,
                   step_ms=round(dt * 1e3, 3),
                   fine_grid_points_per_s=round(bsz * N_FINE * N_FINE / dt, 1),
                   ms_per_sample=round(dt * 1e3 / bsz, 3))
        row.update(_roofline(step, args, dt))
        rows.append(row)
        print(json.dumps(row), flush=True)
        # free the compiled executable + buffers before the next point
        del step, args
        jax.clear_caches()
    out = dict(
        workload="ex2_darcy_2d_train_step",
        config="141^2 fine / 43^2 coarse, d=128, 6 galerkin layers, bf16 "
               "encoder + bf16 conv scalers, high matmul precision",
        device=str(jax.devices()[0].device_kind),
        rows=rows,
    )
    path = os.path.join(REPO, "eval", "ex2_batch_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
