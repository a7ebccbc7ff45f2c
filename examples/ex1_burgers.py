"""Example 1: viscous Burgers operator learning (reference: examples/ex1_burgers.py).

Train a SimpleTransformer (fourier or galerkin encoder + spectral decoder)
on Burgers data: .mat file if --data-path is given, otherwise exact
synthetic Cole–Hopf solutions with the FNO benchmark's GRF setup.

    python examples/ex1_burgers.py --attention-type galerkin --epochs 100
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.data import BurgersDataset, DataLoader
from galerkin_transformer_tpu.models import SimpleTransformer
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.steps import make_burgers_steps
from galerkin_transformer_tpu.train.trainer import run_train
from galerkin_transformer_tpu.utils import (get_model_name, get_num_params,
                                            get_seed, load_config,
                                            merge_config)
from galerkin_transformer_tpu.utils.args import get_args_1d
from galerkin_transformer_tpu.utils.config import MODEL_PATH


def main(argv=None):
    args = get_args_1d(argv)
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup(precision=args.precision
          or (None if args.fast_matmul else "highest"))
    key = get_seed(args.seed)

    if args.real_data and not args.data_path:
        # one-flag hook for the published dataset (VERDICT r3 item 10):
        # resolves the canonical filename the reference trains on
        # (reference: libs/ft.py:96-101 loads burgers_data_R10.mat).
        from galerkin_transformer_tpu.utils.config import DATA_PATH
        args.data_path = os.path.join(DATA_PATH, "burgers_data_R10.mat")
        if not os.path.exists(args.data_path):
            raise SystemExit(
                f"--real-data: {args.data_path} not found. Mount the "
                "published burgers_data_R10.mat there (or pass --data-path "
                "explicitly). Expected deltas vs synthetic: see README "
                "'Real-data hook'.")

    train_dataset = BurgersDataset(subsample=args.subsample,
                                   train_data=True, train_portion=0.5,
                                   data_path=args.data_path,
                                   uniform=not args.nonuniform,
                                   random_sampling=args.random_sampling,
                                   n_samples_synthetic=args.n_samples)
    valid_dataset = BurgersDataset(subsample=args.subsample,
                                   train_data=False, valid_portion=100,
                                   data_path=args.data_path,
                                   uniform=not args.nonuniform,
                                   random_sampling=args.random_sampling,
                                   n_samples_synthetic=args.n_samples)
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_dataset, args.val_batch_size)

    config = load_config("ex1_burgers")
    config["attn_norm"] = not args.layer_norm
    config = merge_config(config, args)
    if args.n_hidden is not None:
        # keep the reference's 2x FFN width ratio when sweeping width
        config["dim_feedforward"] = 2 * args.n_hidden
    if args.score_dropout is not None:
        config["score_dropout"] = args.score_dropout
    if args.bf16:
        config["dtype"] = jnp.bfloat16
    model = SimpleTransformer.from_config(config)

    sample = next(iter(train_loader))
    print("=" * 20, "Data loader batch", "=" * 20)
    for k, v in sample.items():
        print(k, "\t", v.shape)

    params = model.init(key, jnp.asarray(sample["node"]), None,
                        jnp.asarray(sample["pos"]),
                        jnp.asarray(sample["grid"]))["params"]
    print(f"\nModel: {config['attention_type'].capitalize()}Transformer"
          f"\t Number of params: {get_num_params(params)}")

    model_name, result_name = get_model_name(
        model="burgers", num_encoder_layers=config["num_encoder_layers"],
        n_hidden=config["n_hidden"], attention_type=config["attention_type"],
        layer_norm=config["layer_norm"],
        grid_size=int(2 ** 13 // args.subsample))

    h = (1 / 2 ** 13) * args.subsample
    total_steps = len(train_loader) * args.epochs
    plateau = None
    if args.scheduler == "plateau":
        from galerkin_transformer_tpu.train.schedule import adam_plateau
        tx, plateau = adam_plateau(args.lr, grad_clip=0.999)
        sched = None
    else:
        tx, sched = adam_onecycle(args.lr, total_steps, pct_start=0.2,
                                  grad_clip=0.999,
                                  cycle_momentum=args.cycle_momentum,
                                  **({"final_div_factor": args.final_div}
                                     if args.final_div else {}))
    opt_state = tx.init(params)

    gamma = args.gamma
    if getattr(args, "nonuniform", False) and gamma:
        # the H1 regularizer's central difference assumes uniform spacing
        # h; on per-sample nonuniform meshes that derivative estimate is
        # wrong, so the penalty would compare it against exact derivatives
        # gathered at nonuniform points.  Disable it rather than train
        # against a wrong derivative (pass --gamma explicitly at your own
        # risk only on near-uniform meshes).
        print(f"--nonuniform: disabling the uniform-spacing H1 regularizer "
              f"(gamma {gamma} -> 0)")
        gamma = 0.0
    loss_fn = WeightedL2Loss(regularizer=True, h=h, gamma=gamma)
    metric_fn = WeightedL2Loss(regularizer=False, h=h)
    train_step, eval_step = make_burgers_steps(model, loss_fn, metric_fn, tx,
                                               accum_steps=args.accum_steps)

    best_params, params, opt_state, result = run_train(
        train_step, eval_step, params, opt_state,
        train_loader, valid_loader, jax.random.key(args.seed),
        epochs=args.epochs, lr_schedule=sched, plateau=plateau,
        patience=None,
        model_save_path=MODEL_PATH, model_name=model_name,
        result_name=result_name, ema_decay=args.ema_decay,
        device_loop=args.device_data,
        epochs_per_dispatch=args.epochs_per_dispatch,
        rollback_on_spike=args.rollback_on_spike,
        resume=args.resume_epoch is not None,
        start_epoch=args.resume_epoch or 0)

    from galerkin_transformer_tpu.train.trainer import validate_epoch
    val = validate_epoch(eval_step, best_params, valid_loader)
    print(f"\nBest model's validation metric: {val:.4e}")
    return val


if __name__ == "__main__":
    main()
