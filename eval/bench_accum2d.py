"""Does microbatch accumulation help the copy-bound ex2 2D step?

The round-4 trace (eval/r4_queue/trace_ex2_bf16scalers.log) showed the
ex2 step re-streams its full parameter set every iteration because the
141² conv activations + 1849×128 encoder working set evicts weights
from VMEM.  The 1D fix (--accum-steps 8 at bsz 64 -> 1.72x) shrinks the
live activation set; this measures the same lever at ex2's bsz 4
(microbatches of 2 and 1).  Writes eval/accum_ex2.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    jax.config.update("jax_default_matmul_precision", "high")
    rows = []
    for accum in (1, 2, 4):
        dt, step, args = bench_ours_2d_accum(accum)
        rows.append({
            "accum_steps": accum,
            "batch": 4,
            "step_ms": round(dt * 1e3, 4),
            "fine_grid_points_per_s": round(4 * 141 * 141 / dt, 1),
        })
        print(json.dumps(rows[-1]))
    out = os.path.join(os.path.dirname(__file__), "accum_ex2.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


def bench_ours_2d_accum(accum_steps, batch_size=4, n_fine=141, n_coarse=43):
    """bench_ours_2d with make_darcy_steps(accum_steps=...) — kept in
    sync with bench.py::bench_ours_2d (same shapes/config)."""
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.data.darcy import DarcyDataset
    from galerkin_transformer_tpu.models import FourierTransformer2D
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_darcy_steps
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.profiling import measure
    import bench as B

    down, up = DarcyDataset.get_scaler_sizes(n_fine, n_coarse)
    cfg = load_config("ex2_darcy", path=os.path.join(B.REPO, "config.yml"))
    cfg["attention_type"] = "galerkin"
    cfg["downscaler_size"] = down
    cfg["upscaler_size"] = up
    cfg["norm_eps"] = 1e-7
    cfg["dtype"] = jnp.bfloat16
    model = FourierTransformer2D.from_config(cfg)

    rng = np.random.default_rng(0)
    b = batch_size
    node = jnp.asarray(rng.standard_normal((b, n_fine, n_fine, 1)),
                       jnp.float32)
    edge = jnp.ones((b, 1), jnp.float32)
    xc = jnp.linspace(0, 1, n_coarse, dtype=jnp.float32)
    pc = jnp.stack(jnp.meshgrid(xc, xc, indexing="ij"), -1).reshape(-1, 2)
    pos = jnp.broadcast_to(pc[None], (b, n_coarse * n_coarse, 2))
    xf = jnp.linspace(0, 1, n_fine, dtype=jnp.float32)
    gf = jnp.stack(jnp.meshgrid(xf, xf, indexing="ij"), -1)
    grid = jnp.broadcast_to(gf[None], (b, n_fine, n_fine, 2))
    target = jnp.asarray(rng.standard_normal((b, n_fine, n_fine, 1)),
                         jnp.float32)
    target_grad = jnp.asarray(
        rng.standard_normal((b, n_fine, n_fine, 2)), jnp.float32)
    coeff = jnp.asarray(rng.uniform(3, 12, (b, n_fine, n_fine, 1)),
                        jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=grid, target=target,
                 target_grad=target_grad, coeff=coeff)

    params = model.init(jax.random.key(0), node, edge, pos, grid)["params"]
    h = 1.0 / n_fine
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, pct_start=0.3,
                          grad_clip=0.99)
    opt_state = tx.init(params)
    train_step, _ = make_darcy_steps(
        model, WeightedL2Loss2d(regularizer=True, h=h, gamma=0.5),
        WeightedL2Loss2d(regularizer=False, h=h), tx, donate=False,
        accum_steps=accum_steps)
    key = jax.random.key(0)
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * B.ITERS, iters_lo=B.ITERS)
    return dt, train_step, (params, opt_state, batch, key)


if __name__ == "__main__":
    main()
