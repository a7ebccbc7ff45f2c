"""Dropout-mask PRNG cost on the ex1 train step (VERDICT r3 item 3).

The round-3 trace showed the d=96 step is VPU/small-fusion bound; the
three dropout layers draw threefry bits over (bsz, 2048, 96)-sized masks
every step, and threefry is a long VPU op chain on TPU.  This measures
the full jitted train step at bsz 8 and 64 under

  - threefry2x32 (JAX default, bitwise-reproducible across backends)
  - rbg          (hardware RNG path, much cheaper on TPU)

plus a no-dropout (deterministic) step as the floor, to bound how much
of the step and of the bsz-64 per-sample regression is mask generation.

Writes eval/prng_dropout.json.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GRID = 2048
ITERS = 30


def bench(prng_impl, batch_size, dropout: bool):
    import jax

    jax.config.update("jax_default_prng_impl", prng_impl)
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
    if not dropout:
        for k in list(cfg):
            if "dropout" in k:
                cfg[k] = 0.0
    model = SimpleTransformer.from_config(cfg)

    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 1)),
                       jnp.float32)
    pos = jnp.linspace(0, 1, N_GRID, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (batch_size, N_GRID, 1))
    target = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 2)),
                         jnp.float32)
    batch = dict(node=node, edge=jnp.ones((batch_size, 1), jnp.float32),
                 pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, None, pos, pos)["params"]
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=1 / N_GRID, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1 / N_GRID), tx, donate=False)
    key = jax.random.key(0)
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * ITERS, iters_lo=ITERS)
    return dict(prng=prng_impl, batch=batch_size, dropout=dropout,
                step_ms=round(dt * 1e3, 4),
                per_sample_us=round(dt * 1e6 / batch_size, 2),
                grid_points_per_s=round(batch_size * N_GRID / dt, 1))


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "high")
    rows = []
    for b in (8, 64):
        for impl, drop in (("threefry2x32", True), ("rbg", True),
                           ("threefry2x32", False)):
            r = bench(impl, b, drop)
            print(json.dumps(r), flush=True)
            rows.append(r)
    with open(os.path.join(REPO, "eval", "prng_dropout.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote eval/prng_dropout.json")


if __name__ == "__main__":
    main()
