"""Scripted equivalent of the reference's eval/ex1_burgers_eval.ipynb:
load a trained checkpoint, report the validation rel-L2 metric, optionally
at a different (super) resolution.
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
from galerkin_transformer_tpu.train.checkpoint import load_checkpoint
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.utils import load_config, merge_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=str)
    p.add_argument("--subsample", type=int, default=4)
    p.add_argument("--attention-type", type=str, default="fourier")
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--n-samples", type=int, default=2148)
    p.add_argument("--val-batch-size", type=int, default=4)
    args = p.parse_args(argv)
    jax.config.update("jax_default_matmul_precision", "highest")

    ds = BurgersDataset(subsample=args.subsample, train_data=False,
                        valid_portion=100, data_path=args.data_path,
                        n_samples_synthetic=args.n_samples)
    dl = DataLoader(ds, args.val_batch_size)

    config = merge_config(load_config("ex1_burgers"), args)
    model = SimpleTransformer.from_config(config)
    sample = next(iter(dl))
    template = model.init(jax.random.key(0), jnp.asarray(sample["node"]),
                          None, jnp.asarray(sample["pos"]),
                          jnp.asarray(sample["grid"]))["params"]
    params = load_checkpoint(args.checkpoint, template)

    h = (1 / 2 ** 13) * args.subsample
    metric_fn = WeightedL2Loss(regularizer=False, h=h)

    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch["node"], batch["edge"],
                          batch["pos"], batch["grid"], deterministic=True)
        res = metric_fn(out["preds"][..., 0], batch["target"][..., 0])
        return res.metric

    metrics = [float(eval_step(params, b)) for b in dl]
    print(f"validation metric (n={ds.n_grid}): {np.mean(metrics):.4e}")
    return float(np.mean(metrics))


if __name__ == "__main__":
    main()
