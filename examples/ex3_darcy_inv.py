"""Example 3: inverse Darcy coefficient identification under noise
(reference: examples/ex3_darcy_inv.py).

Solution u (optionally noisy) in, coefficient a out; pointwise decoder, no
H¹ regularizer, loss mesh size h = 1/n_grid_coarse.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from galerkin_transformer_tpu.data import DarcyDataset, DataLoader
from galerkin_transformer_tpu.models import FourierTransformer2D
from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.steps import make_darcy_steps
from galerkin_transformer_tpu.train.trainer import run_train, validate_epoch
from galerkin_transformer_tpu.utils import (get_model_name, get_num_params,
                                            get_seed, load_config,
                                            merge_config)
from galerkin_transformer_tpu.utils.args import get_args_2d
from galerkin_transformer_tpu.utils.config import MODEL_PATH


def main(argv=None):
    args = get_args_2d(subsample_nodes=3, subsample_attn=12, gamma=0.0,
                       noise=0.01, inverse=True, argv=argv)
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup(precision=None if args.fast_matmul else "highest")
    key = get_seed(args.seed)

    kw = dict(inverse_problem=True,
              subsample_attn=args.subsample_attn,
              subsample_nodes=args.subsample_nodes,
              subsample_inverse=args.subsample_attn,
              subsample_method_inverse="average",
              n_grid_fine=args.n_grid_fine,
              noise=args.noise)
    # --online-noise: train inputs stay clean in the dataset; fresh noise
    # is drawn per step inside the train step (valid keeps baked noise)
    train_kw = dict(kw, noise=0.0) if args.online_noise else kw
    train_dataset = DarcyDataset(data_path=args.train_path, train_data=True,
                                 train_len=args.train_len,
                                 n_samples_synthetic=args.n_samples,
                                 **train_kw)
    valid_dataset = DarcyDataset(data_path=args.valid_path,
                                 normalizer_x=train_dataset.normalizer_x,
                                 train_data=False, valid_len=100,
                                 n_samples_synthetic=max(args.n_samples // 4, 8),
                                 **kw)
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_dataset, args.val_batch_size)

    n_grid = int(((args.n_grid_fine - 1) / args.subsample_nodes) + 1)
    n_grid_c = int(((args.n_grid_fine - 1) / args.subsample_attn) + 1)
    downsample, _ = DarcyDataset.get_scaler_sizes(n_grid, n_grid_c)

    config = load_config("ex3_darcy_inv")
    config["downscaler_size"] = downsample
    config["upscaler_size"] = ((n_grid_c, n_grid_c), (n_grid_c, n_grid_c))
    config["attn_norm"] = not args.layer_norm
    config = merge_config(config, args)
    if getattr(args, 'score_dropout', None) is not None:
        config["score_dropout"] = args.score_dropout
    if args.bf16:
        config["dtype"] = jnp.bfloat16
    model = FourierTransformer2D.from_config(config)
    normalizer = train_dataset.normalizer_y.as_tuple()

    sample = next(iter(train_loader))
    print("=" * 20, "Data loader batch", "=" * 20)
    for k, v in sample.items():
        print(k, "\t", v.shape)

    params = model.init(key, jnp.asarray(sample["node"]), None,
                        jnp.asarray(sample["pos"]),
                        jnp.asarray(sample["grid"]))["params"]
    print(f"\nModel: FourierTransformer2D inverse"
          f"\t Number of params: {get_num_params(params)}")

    model_name, result_name = get_model_name(
        model="darcy", num_encoder_layers=config["num_encoder_layers"],
        n_hidden=config["n_hidden"], attention_type=config["attention_type"],
        layer_norm=config["layer_norm"], grid_size=n_grid,
        inverse_problem=True,
        additional_str=f"{config['n_head']}h_{args.noise:.1e}")

    h = 1 / n_grid_c
    total_steps = len(train_loader) * args.epochs
    plateau = None
    if args.scheduler == "plateau":
        from galerkin_transformer_tpu.train.schedule import adam_plateau
        tx, plateau = adam_plateau(args.lr, grad_clip=0.99)
        sched = None
    else:
        tx, sched = adam_onecycle(args.lr, total_steps, pct_start=0.3,
                                  grad_clip=0.99,
                                  cycle_momentum=args.cycle_momentum)
    opt_state = tx.init(params)

    loss_fn = WeightedL2Loss2d(regularizer=False, h=h)
    metric_fn = WeightedL2Loss2d(regularizer=False, h=h)
    train_step, eval_step = make_darcy_steps(
        model, loss_fn, metric_fn, tx, normalizer=normalizer,
        online_noise=args.noise if args.online_noise else 0.0,
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

    val = validate_epoch(eval_step, best_params, valid_loader)
    print(f"\nBest model's validation metric: {val:.4e}")
    return val


if __name__ == "__main__":
    main()
