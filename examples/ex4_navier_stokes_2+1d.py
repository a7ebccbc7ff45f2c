"""Example 4: (2+1)D Navier–Stokes vorticity rollout
(reference: examples/ex4_navier_stokes_2+1d.py).

FourierTransformer2DLite trained autoregressively over a 10-step window —
the whole rollout + BPTT is one lax.scan inside one jitted step.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from galerkin_transformer_tpu.data import DataLoader, NavierStokesDatasetLite
from galerkin_transformer_tpu.models import FourierTransformer2DLite
from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.steps import make_ns_steps
from galerkin_transformer_tpu.train.trainer import run_train, validate_epoch
from galerkin_transformer_tpu.utils import (get_num_params, get_seed,
                                            load_config, merge_config)
from galerkin_transformer_tpu.utils.config import MODEL_PATH
from galerkin_transformer_tpu.utils.prng import SEED


def main(argv=None):
    p = argparse.ArgumentParser(description="Example 4: NS 2+1d rollout")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=SEED)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--fast-matmul", action="store_true", default=False)
    p.add_argument("--ema-decay", type=float, default=None)
    p.add_argument("--scheduler", type=str, default="onecycle",
                   choices=("onecycle", "plateau"))
    p.add_argument("--cycle-momentum", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cycle Adam beta1 0.95->0.85->0.95 with the 1cycle "
                        "lr (torch OneCycleLR's default); "
                        "--no-cycle-momentum holds beta1=0.9")
    p.add_argument("--device-data", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--epochs-per-dispatch", type=int, default=1)
    p.add_argument("--rollback-on-spike", type=float, default=None)
    p.add_argument("--resume-epoch", type=int, default=None)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation microbatches per step "
                        "(see docs/PERFORMANCE.md)")
    args = p.parse_args(argv)
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup(precision=None if args.fast_matmul else "highest")
    key = get_seed(args.seed)

    train_dataset = NavierStokesDatasetLite(
        data_path=args.data_path, train_data=True,
        n_samples_synthetic=args.n_samples)
    valid_dataset = NavierStokesDatasetLite(
        data_path=args.data_path, train_data=False,
        n_samples_synthetic=max(args.n_samples // 4, 4))
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_dataset, args.batch_size)

    config = load_config("ex4_navier_stokes")
    config = merge_config(config, args)
    model = FourierTransformer2DLite.from_config(config)

    sample = next(iter(train_loader))
    print("=" * 20, "Data loader batch", "=" * 20)
    for k, v in sample.items():
        print(k, "\t", v.shape)

    params = model.init(key, jnp.asarray(sample["node"]), None,
                        jnp.asarray(sample["pos"]),
                        jnp.asarray(sample["grid"]))["params"]
    print(f"\nModel: FourierTransformer2DLite"
          f"\t Number of params: {get_num_params(params)}")

    h = 1 / train_dataset.n_grid
    total_steps = len(train_loader) * args.epochs
    plateau = None
    if args.scheduler == "plateau":
        from galerkin_transformer_tpu.train.schedule import adam_plateau
        tx, plateau = adam_plateau(args.lr, grad_clip=0.99)
        sched = None
    else:
        tx, sched = adam_onecycle(args.lr, total_steps, grad_clip=0.99,
                                  cycle_momentum=args.cycle_momentum)
    opt_state = tx.init(params)

    loss_fn = WeightedL2Loss2d(regularizer=True, h=h, gamma=args.gamma)
    metric_fn = WeightedL2Loss2d(regularizer=False, h=h)
    train_step, eval_step = make_ns_steps(
        model, loss_fn, metric_fn, tx,
        time_steps=train_dataset.time_steps_output,
        accum_steps=args.accum_steps)

    best_params, params, opt_state, result = run_train(
        train_step, eval_step, params, opt_state,
        train_loader, valid_loader, jax.random.key(args.seed),
        epochs=args.epochs, lr_schedule=sched, plateau=plateau,
        patience=None,
        model_save_path=MODEL_PATH, model_name="ns_lite.ckpt",
        result_name="ns_lite_result.pkl", ema_decay=args.ema_decay,
        device_loop=args.device_data,
        epochs_per_dispatch=args.epochs_per_dispatch,
        rollback_on_spike=args.rollback_on_spike,
        resume=args.resume_epoch is not None,
        start_epoch=args.resume_epoch or 0)

    val = validate_epoch(eval_step, best_params, valid_loader)
    print(f"\nBest model's validation metric: {val:.4e}")
    return val


if __name__ == "__main__":
    main()
