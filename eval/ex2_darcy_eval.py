"""Darcy forward-problem evaluation (the reference's ex2 eval notebook is
missing from its repo mirror — this is the scripted equivalent)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.data import DarcyDataset, DataLoader
from galerkin_transformer_tpu.models import FourierTransformer2D
from galerkin_transformer_tpu.train.checkpoint import load_checkpoint
from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
from galerkin_transformer_tpu.utils import load_config, merge_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=str)
    p.add_argument("--subsample-nodes", type=int, default=3)
    p.add_argument("--subsample-attn", type=int, default=6)
    p.add_argument("--n-grid-fine", type=int, default=421)
    p.add_argument("--valid-path", type=str, default=None)
    p.add_argument("--n-samples", type=int, default=64)
    args = p.parse_args(argv)
    jax.config.update("jax_default_matmul_precision", "highest")

    kw = dict(subsample_attn=args.subsample_attn,
              subsample_nodes=args.subsample_nodes,
              n_grid_fine=args.n_grid_fine)
    tr = DarcyDataset(train_data=True, train_len=0.9,
                      n_samples_synthetic=args.n_samples * 4, **kw)
    va = DarcyDataset(data_path=args.valid_path,
                      normalizer_x=tr.normalizer_x, train_data=False,
                      valid_len=0.9, n_samples_synthetic=args.n_samples, **kw)
    dl = DataLoader(va, 4)

    n_grid = int(((args.n_grid_fine - 1) / args.subsample_nodes) + 1)
    n_grid_c = int(((args.n_grid_fine - 1) / args.subsample_attn) + 1)
    down, up = DarcyDataset.get_scaler_sizes(n_grid, n_grid_c)
    config = load_config("ex2_darcy")
    config["downscaler_size"] = down
    config["upscaler_size"] = up
    config = merge_config(config, args)
    model = FourierTransformer2D.from_config(config)
    normalizer = tr.normalizer_y.as_tuple()

    sample = next(iter(dl))
    template = model.init(jax.random.key(0), jnp.asarray(sample["node"]),
                          None, jnp.asarray(sample["pos"]),
                          jnp.asarray(sample["grid"]))["params"]
    params = load_checkpoint(args.checkpoint, template)
    metric_fn = WeightedL2Loss2d(regularizer=False, h=1 / n_grid)

    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch["node"], batch["edge"],
                          batch["pos"], batch["grid"],
                          normalizer=normalizer, deterministic=True)
        res = metric_fn(out["preds"][..., 0], batch["target"][..., 0])
        return res.metric

    metrics = [float(eval_step(params, b)) for b in dl]
    print(f"Darcy validation metric (n={n_grid}): {np.mean(metrics):.4e}")
    return float(np.mean(metrics))


if __name__ == "__main__":
    main()
