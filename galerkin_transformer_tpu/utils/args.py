"""CLI flag sets mirroring the reference (libs/utils_ft.py:493-590)."""
from __future__ import annotations

import argparse

from .prng import SEED


def get_args_1d(argv=None):
    p = argparse.ArgumentParser(description="Example 1: Burgers equation")
    p.add_argument("--subsample", type=int, default=4,
                   help="input sampling from 8192 (default: 4 -> 2048 grid)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--val-batch-size", type=int, default=4)
    p.add_argument("--attention-type", type=str, default="fourier",
                   help="fourier|galerkin|linear|softmax|cosine")
    p.add_argument("--xavier-init", type=float, default=1e-2)
    p.add_argument("--diagonal-weight", type=float, default=1e-2)
    p.add_argument("--ffn-dropout", type=float, default=0.0)
    p.add_argument("--encoder-dropout", type=float, default=0.0)
    p.add_argument("--decoder-dropout", type=float, default=0.0)
    p.add_argument("--dropout", type=float, default=0.0,
                   help="model-level feature dropout (config key `dropout`, "
                        "the reference's `dpo` layer)")
    p.add_argument("--score-dropout", type=float, default=None,
                   help="attention score-matrix dropout override. The "
                        "reference hard-codes p=0.5 here regardless of "
                        "config (libs/layers.py:700-701,730-731 call "
                        "F.dropout with default p); set 0.5 to replicate "
                        "that accident, unset for the intended semantics")
    p.add_argument("--layer-norm", action="store_true", default=False)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.1,
                   help="strength of the H1 gradient regularizer")
    p.add_argument("--seed", type=int, default=SEED)
    p.add_argument("--data-path", type=str, default=None,
                   help=".mat file (burgers_data_R10.mat); synthetic if absent")
    p.add_argument("--n-samples", type=int, default=2148,
                   help="synthetic sample count when no .mat file is given")
    p.add_argument("--fast-matmul", action="store_true", default=False,
                   help="default TPU matmul precision (bf16 passes) instead of highest")
    p.add_argument("--precision", type=str, default=None,
                   choices=("default", "high", "highest"),
                   help="matmul precision override: default=1 bf16 pass, "
                        "high=3 passes (~tf32), highest=6 passes (f32); "
                        "wins over --fast-matmul when set")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 encoder activations (params/decoder stay f32)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="parameter EMA decay for eval/checkpoints, e.g. 0.999")
    p.add_argument("--cycle-momentum", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cycle Adam beta1 0.95->0.85->0.95 with the 1cycle "
                        "lr (torch OneCycleLR's default the reference "
                        "trains under); --no-cycle-momentum holds beta1=0.9")
    p.add_argument("--scheduler", type=str, default="onecycle",
                   choices=("onecycle", "plateau"),
                   help="per-batch 1cycle (reference default) or per-value "
                        "ReduceLROnPlateau (reference EPOCH_SCHEDULERS family)")
    p.add_argument("--device-data", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="keep the dataset in HBM and run each epoch as one "
                        "jitted program (train.device_loop); --no-device-data "
                        "uses the host DataLoader per batch")
    p.add_argument("--rollback-on-spike", type=float, default=None,
                   help="failure recovery: if an epoch's train loss exceeds "
                        "this factor x the best epoch loss (or goes "
                        "non-finite), restore the best checkpoint and reset "
                        "Adam moments instead of training on (e.g. 10)")
    p.add_argument("--epochs-per-dispatch", type=int, default=1,
                   help="with --device-data: run k epochs as ONE jitted "
                        "program with on-device best tracking (one host "
                        "round trip per k epochs; checkpoint IO and early "
                        "stop react at block granularity)")
    p.add_argument("--resume-epoch", type=int, default=None,
                   help="resume from the saved checkpoint (params + optimizer "
                        "state) and continue training at this epoch index")
    p.add_argument("--n-hidden", type=int, default=None,
                   help="model width override (config key n_hidden, "
                        "default 96 from config.yml)")
    p.add_argument("--num-encoder-layers", type=int, default=None,
                   help="encoder depth override (config key "
                        "num_encoder_layers, default 4)")
    p.add_argument("--final-div", type=float, default=None,
                   help="OneCycle final_div_factor override (reference "
                        "default 1e4 anneals lr to max_lr/1e4; smaller "
                        "values keep a learning-rate floor on long budgets)")
    p.add_argument("--real-data", action="store_true", default=False,
                   help="train on the published burgers_data_R10.mat "
                        "(resolved from $DATA_PATH; errors with the "
                        "expected location if the file is not mounted) "
                        "instead of the synthetic Cole-Hopf data")
    p.add_argument("--nonuniform", action="store_true", default=False,
                   help="sample each training function on its own "
                        "nonuniform mesh whose node density follows the "
                        "solution roughness sqrt(|f'|^2 + nu|f''|^2) "
                        "(working re-design of the reference's dead "
                        "uniform=False branch, ft.py:207-287)")
    p.add_argument("--random-sampling", action="store_true", default=False,
                   help="with --nonuniform: sample mesh nodes uniformly at "
                        "random instead of by the roughness density")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: split each batch into this "
                        "many microbatches inside one jitted step (exact "
                        "full-batch gradient; at bsz 64, --accum-steps 8 "
                        "keeps each microbatch in the VMEM-resident regime "
                        "and is 1.7x faster than the monolithic step — "
                        "docs/PERFORMANCE.md)")
    return p.parse_args(argv)


def get_args_2d(subsample_nodes=3, subsample_attn=10, gamma=0.5, noise=0.0,
                ffn_dropout=0.1, encoder_dropout=0.05, decoder_dropout=0.0,
                dropout=0.0, inverse=False, argv=None):
    desc = ("Example 3: inverse coefficient identification for Darcy flow"
            if inverse else "Example 2: Darcy interface flow")
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--subsample-nodes", type=int, default=subsample_nodes)
    p.add_argument("--subsample-attn", type=int, default=subsample_attn)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--val-batch-size", type=int, default=4)
    p.add_argument("--attention-type", type=str, default="galerkin")
    p.add_argument("--noise", type=float, default=noise)
    p.add_argument("--xavier-init", type=float, default=1e-2)
    p.add_argument("--diagonal-weight", type=float, default=1e-2)
    p.add_argument("--ffn-dropout", type=float, default=ffn_dropout)
    p.add_argument("--encoder-dropout", type=float, default=encoder_dropout)
    p.add_argument("--dropout", type=float, default=dropout)
    p.add_argument("--score-dropout", type=float, default=None,
                   help="attention score-matrix dropout override "
                        "(see ex1 --score-dropout)")
    p.add_argument("--decoder-dropout", type=float, default=decoder_dropout)
    p.add_argument("--layer-norm", action="store_true", default=False)
    p.add_argument("--n-hidden", type=int, default=None,
                   help="override encoder width (config n_hidden)")
    p.add_argument("--num-encoder-layers", type=int, default=None,
                   help="override encoder depth")
    p.add_argument("--online-noise", action="store_true", default=False,
                   help="resample the train-input measurement noise fresh "
                        "every step inside the jitted train step (the "
                        "reference bakes ONE fixed realization into the "
                        "dataset, ft.py:567-568); validation keeps the "
                        "fixed-noise protocol")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=gamma)
    p.add_argument("--no-scale-factor", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=SEED)
    p.add_argument("--train-path", type=str, default=None)
    p.add_argument("--valid-path", type=str, default=None)
    p.add_argument("--n-grid-fine", type=int, default=421,
                   help="fine grid of the data (421 for the .mat files)")
    p.add_argument("--n-samples", type=int, default=128,
                   help="synthetic sample count when no .mat file is given")
    p.add_argument("--train-len", type=int, default=1024,
                   help="training samples used (reference: 1024)")
    p.add_argument("--fast-matmul", action="store_true", default=False)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 encoder activations (params/decoder stay f32)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="parameter EMA decay for eval/checkpoints, e.g. 0.999")
    p.add_argument("--cycle-momentum", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cycle Adam beta1 0.95->0.85->0.95 with the 1cycle "
                        "lr (torch OneCycleLR's default the reference "
                        "trains under); --no-cycle-momentum holds beta1=0.9")
    p.add_argument("--scheduler", type=str, default="onecycle",
                   choices=("onecycle", "plateau"),
                   help="per-batch 1cycle (reference default) or per-epoch "
                        "ReduceLROnPlateau (reference EPOCH_SCHEDULERS family)")
    p.add_argument("--device-data", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="keep the dataset in HBM and run each epoch as one "
                        "jitted program (train.device_loop); --no-device-data "
                        "uses the host DataLoader per batch")
    p.add_argument("--rollback-on-spike", type=float, default=None,
                   help="failure recovery: if an epoch's train loss exceeds "
                        "this factor x the best epoch loss (or goes "
                        "non-finite), restore the best checkpoint and reset "
                        "Adam moments instead of training on (e.g. 10)")
    p.add_argument("--epochs-per-dispatch", type=int, default=1,
                   help="with --device-data: run k epochs as ONE jitted "
                        "program with on-device best tracking (one host "
                        "round trip per k epochs; checkpoint IO and early "
                        "stop react at block granularity)")
    p.add_argument("--resume-epoch", type=int, default=None,
                   help="resume from the saved checkpoint (params + optimizer "
                        "state) and continue training at this epoch index")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: split each batch into this "
                        "many microbatches inside one jitted step (exact "
                        "full-batch gradient for the mean-reduced losses; "
                        "see docs/PERFORMANCE.md)")
    return p.parse_args(argv)
