"""Gradient-accumulation microbatching vs the bsz-64 copy penalty.

docs/PERFORMANCE.md ("MFU vs model width") traces the bsz-64 per-sample
regression to per-iteration weight re-staging once the activation set
evicts the weights from VMEM.  A scanned microbatch step keeps the live
activation set at microbatch size — this measures whether that recovers
bsz-8 per-sample efficiency at an effective batch of 64.

Writes eval/accum_bsz64.json.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GRID = 2048
BATCH = 64
ITERS = 20


def bench(accum_steps):
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
    cfg["dtype"] = jnp.bfloat16
    model = SimpleTransformer.from_config(cfg)

    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((BATCH, N_GRID, 1)), jnp.float32)
    pos = jnp.linspace(0, 1, N_GRID, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (BATCH, N_GRID, 1))
    target = jnp.asarray(rng.standard_normal((BATCH, N_GRID, 2)),
                         jnp.float32)
    batch = dict(node=node, edge=jnp.ones((BATCH, 1), jnp.float32),
                 pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, None, pos, pos)["params"]
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=1 / N_GRID, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1 / N_GRID), tx, donate=False,
        accum_steps=accum_steps)
    dt = measure(train_step, params, opt_state, batch, jax.random.key(0),
                 iters=3 * ITERS, iters_lo=ITERS)
    return dict(accum_steps=accum_steps, batch=BATCH,
                step_ms=round(dt * 1e3, 4),
                per_sample_us=round(dt * 1e6 / BATCH, 2),
                grid_points_per_s=round(BATCH * N_GRID / dt, 1))


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "high")
    rows = []
    for a in (1, 2, 4, 8):
        r = bench(a)
        print(json.dumps(r), flush=True)
        rows.append(r)
    with open(os.path.join(REPO, "eval", "accum_bsz64.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote eval/accum_bsz64.json")


if __name__ == "__main__":
    main()
