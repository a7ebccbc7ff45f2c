"""Headline benchmark: ex1 Burgers training-step throughput.

Measures the fully-jitted training step (forward + Sobolev loss + backward +
clip + Adam + 1cycle) of the flagship SimpleTransformer (4-layer galerkin
encoder, d=96, SpectralConv1d decoder) at the reference's ex1 defaults
(n=2048, batch 8) on the default JAX backend (TPU chip under the driver),
and — when the torch reference checkout is mounted — the reference's own
train_batch_burgers on this host for the vs_baseline ratio.

Prints ONE json line:
  {"metric": ..., "value": grid-points/sec/chip, "unit": ..., "vs_baseline": ...}
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_GRID = 2048
BATCH = 8
WARMUP = 3
ITERS = 10


def bench_ours():
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
    model = SimpleTransformer.from_config(cfg)

    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((BATCH, N_GRID, 1)), jnp.float32)
    edge = jnp.ones((BATCH, 1), jnp.float32)
    pos = jnp.linspace(0, 1, N_GRID, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (BATCH, N_GRID, 1))
    target = jnp.asarray(rng.standard_normal((BATCH, N_GRID, 2)), jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, edge, pos, pos)["params"]
    h = 1.0 / N_GRID
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=h, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=h), tx)

    key = jax.random.key(0)
    for _ in range(WARMUP):
        params, opt_state, key, losses = train_step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, key, losses = train_step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def bench_reference():
    """Reference torch train step on this host (its only runnable backend
    here).  Returns seconds/step or None."""
    ref = "/root/reference/libs"
    if not os.path.exists(ref):
        return None
    try:
        import types
        if "torchinfo" not in sys.modules:
            stub = types.ModuleType("torchinfo")
            stub.summary = lambda *a, **k: None
            sys.modules["torchinfo"] = stub
        sys.path.insert(0, ref)
        import numpy as np
        import torch
        import yaml
        from model import SimpleTransformer as RefModel
        from ft import WeightedL2Loss as RefLoss
        from utils_ft import train_batch_burgers
        from torch.optim.lr_scheduler import OneCycleLR

        with open(os.path.join(REPO, "config.yml")) as f:
            cfg = yaml.safe_load(f)["ex1_burgers"]
        cfg["attention_type"] = "galerkin"
        cfg["debug"] = False
        model = RefModel(**cfg)
        device = torch.device("cpu")
        rng = np.random.default_rng(0)
        data = dict(
            node=torch.tensor(rng.standard_normal((BATCH, N_GRID, 1)),
                              dtype=torch.float32),
            edge=torch.ones(BATCH, 1),
            pos=torch.linspace(0, 1, N_GRID)[None, :, None].repeat(BATCH, 1, 1),
            target=torch.tensor(rng.standard_normal((BATCH, N_GRID, 2)),
                                dtype=torch.float32),
        )
        data["grid"] = data["pos"]
        optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
        scheduler = OneCycleLR(optimizer, max_lr=1e-3, div_factor=1e4,
                               final_div_factor=1e4, pct_start=0.2,
                               steps_per_epoch=100, epochs=100)
        loss_fn = RefLoss(regularizer=True, h=1 / N_GRID, gamma=0.1)
        for _ in range(1):
            train_batch_burgers(model, loss_fn, data, optimizer, scheduler,
                                device)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            train_batch_burgers(model, loss_fn, data, optimizer, scheduler,
                                device)
        return (time.perf_counter() - t0) / iters
    except Exception:
        return None


def main():
    dt = bench_ours()
    points_per_sec = BATCH * N_GRID / dt
    ref_dt = bench_reference()
    vs = (ref_dt / dt) if ref_dt else None
    print(json.dumps({
        "metric": "ex1_burgers_galerkin_train_step_grid_points_per_sec_per_chip",
        "value": round(points_per_sec, 1),
        "unit": "grid-points/s (n=2048, bsz=8, full train step)",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
