"""Example 1c: Performer/FAVOR+ and random-Fourier-feature attention on
Burgers (reference: examples/ex1_burgers_random_fourier_features.py).

Reference-reported ablation (its trailing docstring :540-551): favor with
pos-concat + diagonal init 1.582e-3; plain RFA 1.715e-2 — random-feature
softmax approximations trail the Galerkin/Fourier kernels.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from galerkin_transformer_tpu.data import BurgersDataset, DataLoader
from galerkin_transformer_tpu.models import Identity, SpectralRegressor
from galerkin_transformer_tpu.models.random_fourier import \
    RandomFourierEncoderLayer
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.train.schedule import adam_onecycle
from galerkin_transformer_tpu.train.trainer import run_train, validate_epoch
from galerkin_transformer_tpu.utils import get_num_params, get_seed, load_config
from galerkin_transformer_tpu.utils.args import get_args_1d
from galerkin_transformer_tpu.utils.config import MODEL_PATH

import optax


class RandomFourierTransformer(nn.Module):
    """concat(node,pos) -> lift -> RF encoder stack -> spectral decoder
    (reference example :390-470)."""
    node_feats: int = 2
    n_hidden: int = 96
    num_encoder_layers: int = 4
    n_head: int = 1
    dim_feedforward: int = 192
    attention_type: str = "favor"
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    freq_dim: int = 48
    num_regressor_layers: int = 2
    fourier_modes: int = 16
    n_targets: int = 1
    dropout: float = 0.0
    encoder_dropout: float = 0.0
    ffn_dropout: float = 0.0
    decoder_dropout: float = 0.0

    @nn.compact
    def __call__(self, node, edge=None, pos=None, grid=None,
                 deterministic: bool = True):
        node = jnp.concatenate([node, pos.astype(node.dtype)], axis=-1)
        x = Identity(self.node_feats, self.n_hidden, name="feat_extract")(node)
        for i in range(self.num_encoder_layers):
            x = RandomFourierEncoderLayer(
                d_model=self.n_hidden, n_head=self.n_head,
                dim_feedforward=self.dim_feedforward,
                attention_type=self.attention_type,
                xavier_init=self.xavier_init,
                diagonal_weight=self.diagonal_weight,
                dropout=self.encoder_dropout,
                ffn_dropout=self.ffn_dropout,
                name=f"encoder_layer{i}")(x, pos, deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = SpectralRegressor(in_dim=self.n_hidden, n_hidden=self.n_hidden,
                              freq_dim=self.freq_dim, out_dim=self.n_targets,
                              num_spectral_layers=self.num_regressor_layers,
                              modes=self.fourier_modes, spacial_dim=1,
                              dim_feedforward=self.freq_dim,
                              dropout=self.decoder_dropout,
                              name="regressor")(x, deterministic=deterministic)
        return dict(preds=x, preds_freq=None, preds_latent=None,
                    attn_weights=None)


def main(argv=None):
    args = get_args_1d(argv)
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup(precision=None if args.fast_matmul else "highest")
    key = get_seed(args.seed)
    attention_type = (args.attention_type
                      if args.attention_type in ("favor", "rfa") else "favor")

    train_dataset = BurgersDataset(subsample=args.subsample, train_data=True,
                                   train_portion=0.5, data_path=args.data_path,
                                   n_samples_synthetic=args.n_samples)
    valid_dataset = BurgersDataset(subsample=args.subsample, train_data=False,
                                   valid_portion=100, data_path=args.data_path,
                                   n_samples_synthetic=args.n_samples)
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_dataset, args.val_batch_size)

    model = RandomFourierTransformer(
        attention_type=attention_type,
        xavier_init=args.xavier_init, diagonal_weight=args.diagonal_weight,
        encoder_dropout=args.encoder_dropout, ffn_dropout=args.ffn_dropout,
        decoder_dropout=args.decoder_dropout)

    sample = next(iter(train_loader))
    variables = model.init(key, jnp.asarray(sample["node"]), None,
                           jnp.asarray(sample["pos"]),
                           jnp.asarray(sample["grid"]))
    params = variables["params"]
    rf_state = variables.get("random_features", {})
    print(f"RandomFourierTransformer ({attention_type}) "
          f"params: {get_num_params(params)}")

    h = (1 / 2 ** 13) * args.subsample
    total_steps = len(train_loader) * args.epochs
    tx, sched = adam_onecycle(args.lr, total_steps, grad_clip=0.999)
    opt_state = tx.init(params)
    loss_fn = WeightedL2Loss(regularizer=True, h=h, gamma=args.gamma)
    metric_fn = WeightedL2Loss(regularizer=False, h=h)

    @jax.jit
    def train_step(params, rf_state, opt_state, batch, rng):
        rng, d_rng, f_rng = jax.random.split(rng, 3)

        def lf(p):
            out, mut = model.apply(
                {"params": p, "random_features": rf_state},
                batch["node"], None, batch["pos"], batch["grid"],
                deterministic=False, mutable=["random_features"],
                rngs={"dropout": d_rng, "random_features": f_rng})
            preds = out["preds"]
            res = loss_fn(preds[..., 0], batch["target"][..., 0],
                          targets_prime=batch["target"][..., 1])
            return res.loss + res.reg, (res, mut)
        (_, (res, mut)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut["random_features"], opt_state, rng, res.loss + res.reg

    @jax.jit
    def eval_step(params, rf_state, batch):
        out = model.apply({"params": params, "random_features": rf_state},
                          batch["node"], None, batch["pos"], batch["grid"],
                          deterministic=True)
        res = metric_fn(out["preds"][..., 0], batch["target"][..., 0])
        return res.metric

    import numpy as np
    rng = jax.random.key(args.seed)
    best = np.inf
    for ep in range(args.epochs):
        for batch in train_loader:
            params, rf_state, opt_state, rng, loss = train_step(
                params, rf_state, opt_state, batch, rng)
        val = float(np.mean([float(eval_step(params, rf_state, b))
                             for b in valid_loader]))
        best = min(best, val)
        print(f"epoch [{ep + 1}/{args.epochs}] loss {float(loss):.3e} "
              f"val {val:.3e} best {best:.3e}", flush=True)
    print(f"\nBest validation metric ({attention_type}): {best:.4e}")
    return best


if __name__ == "__main__":
    main()
