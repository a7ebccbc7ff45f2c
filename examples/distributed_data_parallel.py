"""Distributed data-parallel training demo.

Runs the ex1 Burgers training step across a `jax.sharding.Mesh`: params and
optimizer state replicated, batches sharded over the 'data' axis — XLA
inserts the gradient all-reduce.  On a multi-chip TPU slice this is the
production configuration; on CPU it runs on 8 virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_data_parallel.py --epochs 3

(reference has no distributed path — SURVEY §2.8; this is a new
first-class component.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.data import BurgersDataset, DataLoader
from galerkin_transformer_tpu.models import SimpleTransformer
from galerkin_transformer_tpu.parallel import (batch_sharding, make_mesh,
                                               replicate, shard_batch)
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.steps import make_burgers_steps
from galerkin_transformer_tpu.utils import load_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--subsample", type=int, default=16)
    p.add_argument("--n-samples", type=int, default=128)
    p.add_argument("--per-device-batch", type=int, default=2)
    args = p.parse_args(argv)

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, seq=1)
    batch_size = args.per_device_batch * n_dev
    print(f"devices: {n_dev}, global batch: {batch_size}")

    tr = BurgersDataset(subsample=args.subsample, train_data=True,
                        train_portion=0.8, n_samples_synthetic=args.n_samples)
    va = BurgersDataset(subsample=args.subsample, train_data=False,
                        valid_portion=0.2, n_samples_synthetic=args.n_samples)
    tl = DataLoader(tr, batch_size, shuffle=True, drop_last=True)
    vl = DataLoader(va, batch_size, drop_last=False)

    cfg = load_config("ex1_burgers")
    cfg["attention_type"] = "galerkin"
    model = SimpleTransformer.from_config(cfg)
    b = next(iter(tl))
    params = model.init(jax.random.key(0), jnp.asarray(b["node"]), None,
                        jnp.asarray(b["pos"]), jnp.asarray(b["grid"]))["params"]
    h = (1 / 2 ** 13) * args.subsample
    tx, sched = adam_onecycle(1e-3, total_steps=len(tl) * args.epochs)
    opt_state = tx.init(params)

    params = jax.device_put(params, replicate(mesh))
    opt_state = jax.device_put(opt_state, replicate(mesh))
    rng = jax.device_put(jax.random.key(0), replicate(mesh))

    train_step, eval_step = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=h, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=h), tx, donate=False)

    for ep in range(args.epochs):
        for batch in tl:
            batch = shard_batch(mesh, batch)
            params, opt_state, rng, losses = train_step(params, opt_state,
                                                        batch, rng)
        vals = [float(eval_step(params, shard_batch(mesh, bb))) for bb in vl]
        print(f"epoch {ep + 1}: loss {float(losses[0]):.3e} "
              f"val {np.mean(vals):.3e}", flush=True)
    print("data-parallel training ok")


if __name__ == "__main__":
    if jax.default_backend() == "cpu" and len(jax.devices()) == 1:
        print("hint: set XLA_FLAGS=--xla_force_host_platform_device_count=8")
    main()
