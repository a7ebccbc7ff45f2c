"""Example 1b: zero-shot super-resolution
(reference: examples/ex1_burgers_super_res.py).

Train at n=2048 (subsample 4), evaluate at n=8192 (subsample 1) with no
fine-tuning — discretization invariance of the learned operator.
``--train-subsample/--eval-subsample`` generalize the pair (reverse
cell: ``--train-subsample 1 --eval-subsample 4`` trains at full
resolution and evaluates zero-shot on the subsampled grid).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from galerkin_transformer_tpu.data import BurgersDataset, DataLoader
from galerkin_transformer_tpu.models import SimpleTransformer
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.steps import make_burgers_steps
from galerkin_transformer_tpu.train.trainer import run_train, validate_epoch
from galerkin_transformer_tpu.utils import (get_num_params, get_seed,
                                            load_config, merge_config)
from galerkin_transformer_tpu.utils.args import get_args_1d
from galerkin_transformer_tpu.utils.config import MODEL_PATH


def _split_extra(argv):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--train-subsample", type=int, default=4)
    p.add_argument("--eval-subsample", type=int, default=1)
    extra, rest = p.parse_known_args(argv)
    return extra, rest


def main(argv=None):
    extra, rest = _split_extra(sys.argv[1:] if argv is None else argv)
    args = get_args_1d(rest)
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup(precision=None if args.fast_matmul else "highest")
    key = get_seed(args.seed)

    train_dataset = BurgersDataset(subsample=extra.train_subsample,
                                   train_data=True,
                                   train_portion=0.5,
                                   data_path=args.data_path,
                                   n_samples_synthetic=args.n_samples)
    valid_dataset = BurgersDataset(subsample=extra.eval_subsample,
                                   train_data=False,
                                   valid_portion=100,
                                   data_path=args.data_path,
                                   n_samples_synthetic=args.n_samples)
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_dataset, args.val_batch_size)

    config = load_config("ex1_burgers")
    config["attn_norm"] = not args.layer_norm
    config = merge_config(config, args)
    model = SimpleTransformer.from_config(config)

    sample = next(iter(train_loader))
    params = model.init(key, jnp.asarray(sample["node"]), None,
                        jnp.asarray(sample["pos"]),
                        jnp.asarray(sample["grid"]))["params"]
    print(f"params: {get_num_params(params)}  "
          f"train n={train_dataset.n_grid} eval n={valid_dataset.n_grid}")

    h_train = (1 / 2 ** 13) * extra.train_subsample
    h_eval = (1 / 2 ** 13) * extra.eval_subsample
    total_steps = len(train_loader) * args.epochs
    tx, sched = adam_onecycle(args.lr, total_steps, grad_clip=0.999,
                              cycle_momentum=args.cycle_momentum)
    opt_state = tx.init(params)

    train_step, eval_step = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=h_train, gamma=args.gamma),
        WeightedL2Loss(regularizer=False, h=h_eval), tx)

    best_params, params, opt_state, result = run_train(
        train_step, eval_step, params, opt_state,
        train_loader, valid_loader, jax.random.key(args.seed),
        epochs=args.epochs, lr_schedule=sched, patience=None,
        model_save_path=MODEL_PATH, model_name="burgers_super_res.ckpt",
        result_name="burgers_super_res.pkl", ema_decay=args.ema_decay,
        device_loop=args.device_data,
        epochs_per_dispatch=args.epochs_per_dispatch,
        rollback_on_spike=args.rollback_on_spike)

    val = validate_epoch(eval_step, best_params, valid_loader)
    print(f"\nZero-shot super-res validation metric "
          f"(train n={train_dataset.n_grid} -> eval "
          f"n={valid_dataset.n_grid}): {val:.4e}")
    return val


if __name__ == "__main__":
    main()
