"""MFU vs model width (VERDICT r3 item 3): substantiate the round-3
trace's claim that "MFU rises with model width, not batch".

Measures the full ex1-style jitted train step (forward + Sobolev loss +
backward + clip + Adam) at widths d in {96, 128, 192, 256} (bf16 encoder
+ high matmul precision, the bench.py headline config), and the batch-64
point at each width.  Writes eval/width_mfu.json.

Usage: python eval/bench_width_mfu.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GRID = 2048
ITERS = 10


def bench_width(d_model, batch_size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.profiling import measure

    cfg = load_config("ex1_burgers", path=os.path.join(REPO, "config.yml"))
    cfg["attention_type"] = "galerkin"
    cfg["n_hidden"] = d_model
    cfg["dim_feedforward"] = 2 * d_model
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
        model, WeightedL2Loss(regularizer=True, h=1 / N_GRID, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1 / N_GRID), tx, donate=False)
    key = jax.random.key(0)
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * ITERS, iters_lo=ITERS)
    row = dict(d_model=d_model, batch=batch_size,
               step_ms=round(dt * 1e3, 3),
               grid_points_per_s=round(batch_size * N_GRID / dt, 1),
               per_sample_ms=round(dt * 1e3 / batch_size, 4))
    sys.path.insert(0, REPO)
    import bench
    row.update(bench._roofline(train_step,
                               (params, opt_state, batch, key), dt))
    return row


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "high")
    rows = []
    for d in (96, 128, 192, 256):
        for b in (8, 64):
            r = bench_width(d, b)
            print(json.dumps(r), flush=True)
            rows.append(r)
    out = os.path.join(REPO, "eval", "width_mfu.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
