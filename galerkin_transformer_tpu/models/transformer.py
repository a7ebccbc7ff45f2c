"""Full operator-learning models (reference: libs/model.py:752-1283).

All three models keep the reference's I/O protocol:
  inputs  node, edge, pos, grid (+ weight / boundary_value)
  output  dict(preds, preds_freq, preds_latent, attn_weights)

Config protocol: `Model.from_config(dict)` filters a flat config dict (the
config.yml block merged with CLI args) down to declared fields — the
explicit counterpart of the reference's ``defaultdict(lambda: None)``
attribute soup (model.py:753-755, 832-845).

The target normalizer is *data*, not a module: it is passed to __call__ as
a ``(mean, std, eps)`` tuple instead of being smuggled inside the network
with custom .to()/.cuda() overrides (reference model.py:1026-1042).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import default
from .encoder import (SimpleTransformerEncoderLayer,
                      VanillaTransformerEncoderLayer)
from .graph import GAT, GCN
from .layers import BulkRegressor, Identity, torch_linear_init
from .regressor import PointwiseRegressor, SpectralRegressor
from .scaler import DownScaler, UpScaler


def _freeze(v):
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


class _ConfigurableModel(nn.Module):
    @classmethod
    def from_config(cls, config: dict, **overrides) -> "_ConfigurableModel":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: _freeze(v) for k, v in dict(config).items() if k in fields}
        kwargs.update(overrides)
        return cls(**kwargs)


def inverse_transform(x, normalizer: Optional[Tuple]):
    """Undo a UnitGaussianNormalizer: x·(std+eps)+mean."""
    if normalizer is None:
        return x
    mean, std, eps = normalizer
    return x * (std + eps) + mean


class SimpleTransformer(_ConfigurableModel):
    """1D operator learner (ex1 Burgers) — reference model.py:752-942."""
    node_feats: int = 1
    edge_feats: Optional[int] = None
    pos_dim: int = 1
    n_targets: int = 1
    n_hidden: int = 96
    num_feat_layers: int = 0
    num_encoder_layers: int = 4
    n_head: int = 1
    pred_len: int = 0
    n_freq_targets: int = 0
    dim_feedforward: Optional[int] = None
    feat_extract_type: Optional[str] = None
    graph_activation: bool = True
    raw_laplacian: Optional[bool] = None
    attention_type: str = "fourier"
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    symmetric_init: bool = False
    layer_norm: bool = False
    attn_norm: Optional[bool] = True
    norm_type: Optional[str] = "layer"
    norm_eps: Optional[float] = None
    batch_norm: bool = False
    spacial_residual: bool = False
    return_attn_weight: bool = False
    return_latent: bool = False
    residual_type: Optional[str] = "add"
    attn_activation: Optional[str] = None
    seq_len: Optional[int] = None
    bulk_regression: bool = False
    decoder_type: str = "ifft"
    freq_dim: int = 48
    num_regressor_layers: int = 2
    fourier_modes: int = 16
    spacial_dim: Optional[int] = None
    spacial_fc: bool = False
    regressor_activation: Optional[str] = None
    dropout: Optional[float] = None
    encoder_dropout: Optional[float] = 0.0
    decoder_dropout: Optional[float] = 0.0
    ffn_dropout: Optional[float] = 0.0
    score_dropout: Optional[float] = None  # attn score-dropout override
    dtype: Optional[Any] = None   # encoder compute dtype, e.g. jnp.bfloat16
    seq_mesh: Optional[Any] = None  # sequence-parallel mesh (parallel.galerkin)

    @nn.compact
    def __call__(self, node, edge=None, pos=None, grid=None, weight=None,
                 deterministic: bool = True):
        spacial_dim = default(self.spacial_dim, self.pos_dim)
        dropout = default(self.dropout, 0.05)
        num_encoder_layers = self.num_encoder_layers
        if self.decoder_type == "attention":
            num_encoder_layers += 1

        x_latent, attn_weights = [], []

        # ---- feature extractor (Identity lift / GCN / GAT)
        if self.num_feat_layers > 0 and self.feat_extract_type == "gcn":
            x = GCN(node_feats=self.node_feats, edge_feats=self.edge_feats,
                    num_gcn_layers=self.num_feat_layers,
                    out_features=self.n_hidden,
                    activation=self.graph_activation,
                    raw_laplacian=bool(self.raw_laplacian),
                    name="feat_extract")(node, edge, deterministic)
        elif self.num_feat_layers > 0 and self.feat_extract_type == "gat":
            x = GAT(node_feats=self.node_feats,
                    out_features=self.n_hidden,
                    num_gcn_layers=self.num_feat_layers,
                    activation=bool(self.graph_activation),
                    name="feat_extract")(node, edge, deterministic)
        else:
            x = Identity(self.node_feats, self.n_hidden,
                         name="feat_extract")(node)

        if self.spacial_residual or self.return_latent:
            res = x
            x_latent.append(res)

        # ---- encoder stack
        attention_types = ("fourier", "integral", "cosine", "galerkin",
                           "linear", "softmax", "local", "global", "causal")
        if self.attention_type not in attention_types:
            # softmax baseline: torch nn.TransformerEncoderLayer equivalent
            # (reference model.py:884-891 falls back to
            # _TransformerEncoderLayer for unknown attention types)
            for i in range(num_encoder_layers):
                x = VanillaTransformerEncoderLayer(
                    d_model=self.n_hidden, nhead=self.n_head,
                    dim_feedforward=default(self.dim_feedforward,
                                            2 * self.n_hidden),
                    layer_norm=self.layer_norm,
                    dropout=default(self.encoder_dropout, 0.1),
                    name=f"encoder_layer{i}")(x, deterministic=deterministic)
                if self.return_latent:
                    x_latent.append(x)
            num_encoder_layers = 0  # skip the loop below
        for i in range(num_encoder_layers):
            layer = SimpleTransformerEncoderLayer(
                d_model=self.n_hidden,
                n_head=self.n_head,
                attention_type=self.attention_type,
                dim_feedforward=default(self.dim_feedforward, 2 * self.n_hidden),
                layer_norm=self.layer_norm,
                attn_norm=self.attn_norm,
                norm_type=self.norm_type,
                norm_eps=self.norm_eps,
                batch_norm=self.batch_norm,
                pos_dim=self.pos_dim,
                xavier_init=self.xavier_init,
                diagonal_weight=self.diagonal_weight,
                symmetric_init=self.symmetric_init,
                attn_weight=self.return_attn_weight,
                residual_type=self.residual_type,
                activation_type=self.attn_activation,
                dropout=self.encoder_dropout,
                ffn_dropout=self.ffn_dropout,
                score_dropout=self.score_dropout,
                dtype=self.dtype,
                seq_mesh=self.seq_mesh,
                name=f"encoder_layer{i}")
            if self.return_attn_weight:
                x, attn_w = layer(x, pos, weight, deterministic)
                attn_weights.append(attn_w)
            else:
                x = layer(x, pos, weight, deterministic)
            if self.return_latent:
                x_latent.append(x)
        if self.dtype is not None:
            x = x.astype(jnp.float32)   # decoder stays f32

        if self.spacial_residual:
            x = res + x

        # ---- optional frequency-domain targets
        x_freq = None
        if self.n_freq_targets > 0:
            if self.bulk_regression:
                x_freq = BulkRegressor(in_dim=self.seq_len,
                                       n_feats=self.n_hidden,
                                       n_targets=self.n_freq_targets,
                                       pred_len=self.pred_len,
                                       name="freq_regressor")(
                    x, deterministic=deterministic)
            else:
                h = nn.Dense(self.n_hidden, name="freq_fc1",
                             **torch_linear_init(x.shape[-1]))(x)
                x_freq = nn.Dense(self.n_freq_targets, name="freq_fc2",
                                  **torch_linear_init(self.n_hidden))(
                    jnp.maximum(h, 0))
            x_freq = x_freq[:, : self.pred_len, :]

        x = nn.Dropout(dropout)(x, deterministic=deterministic)

        # ---- decoder
        if self.decoder_type in ("pointwise", "convolution"):
            x = PointwiseRegressor(in_dim=self.n_hidden,
                                   n_hidden=self.n_hidden,
                                   out_dim=self.n_targets,
                                   spacial_fc=self.spacial_fc,
                                   spacial_dim=spacial_dim,
                                   activation=self.regressor_activation,
                                   dropout=self.decoder_dropout,
                                   init_gain=1e-2,
                                   name="regressor")(
                x, grid=grid, deterministic=deterministic)
        elif self.decoder_type in ("ifft", "attention"):
            x = SpectralRegressor(in_dim=self.n_hidden,
                                  n_hidden=self.n_hidden,
                                  freq_dim=self.freq_dim,
                                  out_dim=self.n_targets,
                                  num_spectral_layers=self.num_regressor_layers,
                                  modes=self.fourier_modes,
                                  spacial_dim=spacial_dim,
                                  spacial_fc=self.spacial_fc,
                                  dim_feedforward=self.freq_dim,
                                  activation=self.regressor_activation,
                                  dropout=self.decoder_dropout,
                                  name="regressor")(
                x, grid=grid, deterministic=deterministic)
        else:
            raise NotImplementedError(
                f"decoder type {self.decoder_type!r} not implemented")

        return dict(preds=x,
                    preds_freq=x_freq,
                    preds_latent=x_latent,
                    attn_weights=attn_weights)


class FourierTransformer2D(_ConfigurableModel):
    """2D dual-resolution operator learner (ex2/ex3) — model.py:945-1184."""
    node_feats: int = 1
    edge_feats: Optional[int] = None
    pos_dim: int = 2
    n_targets: int = 1
    n_hidden: int = 128
    num_feat_layers: int = 0
    num_encoder_layers: int = 6
    n_head: int = 4
    dim_feedforward: Optional[int] = None
    feat_extract_type: Optional[str] = None
    graph_activation: bool = True
    raw_laplacian: Optional[bool] = None
    attention_type: str = "galerkin"
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    symmetric_init: bool = False
    layer_norm: bool = False
    attn_norm: Optional[bool] = True
    norm_type: Optional[str] = "layer"
    norm_eps: Optional[float] = None
    batch_norm: bool = False
    return_attn_weight: bool = False
    return_latent: bool = False
    residual_type: Optional[str] = "add"
    attn_activation: Optional[str] = None
    decoder_type: str = "ifft2"
    freq_dim: int = 32
    num_regressor_layers: int = 2
    fourier_modes: int = 12
    spacial_dim: int = 2
    spacial_fc: bool = True
    regressor_activation: Optional[str] = "silu"
    last_activation: bool = True
    boundary_condition: Optional[str] = None
    upsample_mode: Optional[str] = "interp"
    downsample_mode: Optional[str] = "interp"
    downscaler_size: Optional[Any] = None
    upscaler_size: Optional[Any] = None
    downscaler_activation: Optional[str] = None
    upscaler_activation: Optional[str] = None
    dropout: Optional[float] = None
    encoder_dropout: Optional[float] = 0.05
    decoder_dropout: Optional[float] = 0.0
    ffn_dropout: Optional[float] = 0.05
    score_dropout: Optional[float] = None  # attn score-dropout override
    downscaler_dropout: Optional[float] = 0.05
    upscaler_dropout: Optional[float] = 0.0
    dtype: Optional[Any] = None   # encoder compute dtype, e.g. jnp.bfloat16
    seq_mesh: Optional[Any] = None  # sequence-parallel mesh (parallel.galerkin)

    @nn.compact
    def __call__(self, node, edge=None, pos=None, grid=None, weight=None,
                 boundary_value=None, normalizer: Optional[Tuple] = None,
                 deterministic: bool = True):
        bsz = node.shape[0]
        n_s = int(round(pos.shape[1] ** 0.5))
        dropout = default(self.dropout, 0.05)
        num_encoder_layers = self.num_encoder_layers
        if self.decoder_type == "attention":
            num_encoder_layers += 1

        x_latent, attn_weights = [], []

        # ---- downscaler: fine grid -> coarse attention grid
        if self.downscaler_size:
            x = DownScaler(in_dim=self.node_feats, out_dim=self.n_hidden,
                           downsample_mode=self.downsample_mode,
                           interp_size=self.downscaler_size,
                           dropout=default(self.downscaler_dropout, 0.05),
                           activation_type=self.downscaler_activation,
                           dtype=self.dtype,
                           name="downscaler")(node, deterministic)
        else:
            node = jnp.concatenate(
                [node, pos.reshape(bsz, n_s, n_s, -1).astype(node.dtype)],
                axis=-1)
            x = Identity(self.node_feats + self.spacial_dim, self.n_hidden,
                         name="downscaler")(node)
        x = x.reshape(bsz, -1, self.n_hidden)

        # ---- optional graph feature extractor on the coarse sequence
        if self.feat_extract_type == "gcn" and self.num_feat_layers > 0:
            x = GCN(node_feats=self.n_hidden, edge_feats=self.edge_feats,
                    num_gcn_layers=self.num_feat_layers,
                    out_features=self.n_hidden,
                    activation=self.graph_activation,
                    raw_laplacian=bool(self.raw_laplacian),
                    name="feat_extract")(x, edge, deterministic)
        elif self.feat_extract_type == "gat" and self.num_feat_layers > 0:
            x = GAT(node_feats=self.n_hidden, out_features=self.n_hidden,
                    num_gcn_layers=self.num_feat_layers,
                    activation=bool(self.graph_activation),
                    name="feat_extract")(x, edge, deterministic)

        x = nn.Dropout(dropout)(x, deterministic=deterministic)

        # ---- encoder stack on the coarse grid
        if self.attention_type == "official":
            # reference 'official' branch (model.py:977-987): raw coords
            # concatenated per head, torch TransformerEncoderLayer of width
            # n_hidden + n_head·pos_dim.  (The reference re-concats every
            # layer, which breaks the reshape for >1 layers — here the
            # widening happens once, the documented intent.)
            d_k = self.n_hidden // self.n_head
            xh = x.reshape(bsz, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
            ph = jnp.broadcast_to(
                pos[:, None], (bsz, self.n_head, pos.shape[1],
                               self.pos_dim)).astype(x.dtype)
            xh = jnp.concatenate([ph, xh], axis=-1)
            x = xh.transpose(0, 2, 1, 3).reshape(
                bsz, -1, self.n_head * (d_k + self.pos_dim))
            for i in range(num_encoder_layers):
                x = VanillaTransformerEncoderLayer(
                    d_model=self.n_hidden + self.pos_dim * self.n_head,
                    nhead=self.n_head,
                    dim_feedforward=default(self.dim_feedforward,
                                            2 * self.n_hidden),
                    dropout=default(self.encoder_dropout, 0.1),
                    norm_eps=default(self.norm_eps, 1e-5),
                    name=f"encoder_layer{i}")(x, deterministic=deterministic)
                if self.return_latent:
                    x_latent.append(x)
            x = nn.Dense(self.n_hidden, name="official_proj",
                         **torch_linear_init(x.shape[-1]))(x)
            num_encoder_layers = 0
        for i in range(num_encoder_layers):
            layer = SimpleTransformerEncoderLayer(
                d_model=self.n_hidden,
                n_head=self.n_head,
                attention_type=self.attention_type,
                dim_feedforward=default(self.dim_feedforward, 2 * self.n_hidden),
                layer_norm=self.layer_norm,
                attn_norm=self.attn_norm,
                norm_type=self.norm_type,
                norm_eps=self.norm_eps,
                batch_norm=self.batch_norm,
                pos_dim=self.pos_dim,
                xavier_init=self.xavier_init,
                diagonal_weight=self.diagonal_weight,
                symmetric_init=self.symmetric_init,
                attn_weight=self.return_attn_weight,
                residual_type=self.residual_type,
                activation_type=self.attn_activation,
                dropout=self.encoder_dropout,
                ffn_dropout=self.ffn_dropout,
                score_dropout=self.score_dropout,
                dtype=self.dtype,
                seq_mesh=self.seq_mesh,
                name=f"encoder_layer{i}")
            if self.return_attn_weight:
                x, attn_w = layer(x, pos, weight, deterministic)
                attn_weights.append(attn_w)
            else:
                x = layer(x, pos, weight, deterministic)
            if self.return_latent:
                x_latent.append(x)
        # ---- upscaler: coarse -> fine (compute dtype follows the encoder;
        # the FFT decoder below stays f32)
        x = x.reshape(bsz, n_s, n_s, self.n_hidden)
        if self.upscaler_size:
            x = UpScaler(in_dim=self.n_hidden, out_dim=self.n_hidden,
                         upsample_mode=self.upsample_mode,
                         interp_size=self.upscaler_size,
                         dropout=default(self.upscaler_dropout, 0.0),
                         activation_type=self.upscaler_activation,
                         dtype=self.dtype,
                         name="upscaler")(x, deterministic)
        if self.return_latent:
            x_latent.append(x)

        x = nn.Dropout(dropout)(x, deterministic=deterministic)
        if self.dtype is not None:
            x = x.astype(jnp.float32)   # decoder (FFT) stays f32

        # ---- decoder on the fine grid
        if self.decoder_type == "pointwise":
            reg = PointwiseRegressor(in_dim=self.n_hidden,
                                     n_hidden=self.n_hidden,
                                     out_dim=self.n_targets,
                                     num_layers=self.num_regressor_layers,
                                     spacial_fc=self.spacial_fc,
                                     spacial_dim=self.spacial_dim,
                                     activation=self.regressor_activation,
                                     dropout=self.decoder_dropout,
                                     return_latent=self.return_latent,
                                     name="regressor")
        elif self.decoder_type == "ifft2":
            reg = SpectralRegressor(in_dim=self.n_hidden,
                                    n_hidden=self.freq_dim,
                                    freq_dim=self.freq_dim,
                                    out_dim=self.n_targets,
                                    num_spectral_layers=self.num_regressor_layers,
                                    modes=self.fourier_modes,
                                    spacial_dim=self.spacial_dim,
                                    spacial_fc=self.spacial_fc,
                                    activation=self.regressor_activation,
                                    last_activation=self.last_activation,
                                    dropout=self.decoder_dropout,
                                    return_latent=self.return_latent,
                                    name="regressor")
        else:
            raise NotImplementedError(
                f"decoder type {self.decoder_type!r} not implemented")

        if self.return_latent:
            x, xr_latent = reg(x, grid=grid, deterministic=deterministic)
            x_latent.append(xr_latent)
        else:
            x = reg(x, grid=grid, deterministic=deterministic)

        x = inverse_transform(x, normalizer)

        if self.boundary_condition == "dirichlet":
            # zero the boundary ring, keep interior (model.py:1008-1013)
            x = x[:, 1:-1, 1:-1]
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            if boundary_value is not None:
                x = x + boundary_value

        return dict(preds=x,
                    preds_freq=None,
                    preds_latent=x_latent,
                    attn_weights=attn_weights)


class FourierTransformer2DLite(_ConfigurableModel):
    """Minimal 2D model for NS rollout (ex4) — model.py:1186-1283."""
    node_feats: int = 12
    pos_dim: int = 2
    n_targets: int = 1
    n_hidden: int = 48
    num_feat_layers: int = 0
    num_encoder_layers: int = 4
    n_head: int = 1
    dim_feedforward: Optional[int] = 96
    attention_type: str = "galerkin"
    feat_extract_type: Optional[str] = None
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    symmetric_init: bool = False
    layer_norm: bool = True
    attn_norm: Optional[bool] = False
    norm_type: Optional[str] = "layer"
    norm_eps: Optional[float] = None
    batch_norm: bool = False
    return_attn_weight: bool = False
    return_latent: bool = False
    residual_type: Optional[str] = "add"
    attn_activation: Optional[str] = None
    decoder_type: str = "ifft"
    freq_dim: int = 20
    num_regressor_layers: int = 2
    fourier_modes: int = 12
    spacial_dim: int = 2
    spacial_fc: bool = False
    regressor_activation: Optional[str] = None
    dropout: Optional[float] = 0.0
    encoder_dropout: Optional[float] = 0.0
    decoder_dropout: Optional[float] = 0.0
    ffn_dropout: Optional[float] = 0.05
    score_dropout: Optional[float] = None  # attn score-dropout override
    dtype: Optional[Any] = None   # encoder compute dtype, e.g. jnp.bfloat16
    seq_mesh: Optional[Any] = None  # sequence-parallel mesh (parallel.galerkin)

    @nn.compact
    def __call__(self, node, edge=None, pos=None, grid=None,
                 deterministic: bool = True):
        bsz = node.shape[0]
        input_dim = node.shape[-1]
        n_grid = grid.shape[1]
        dropout = default(self.dropout, 0.05)

        node = jnp.concatenate(
            [node.reshape(bsz, -1, input_dim), pos.astype(node.dtype)], axis=-1)
        x = Identity(self.node_feats, self.n_hidden, name="feat_extract")(node)

        for i in range(self.num_encoder_layers):
            x = SimpleTransformerEncoderLayer(
                d_model=self.n_hidden,
                n_head=self.n_head,
                dim_feedforward=default(self.dim_feedforward, 2 * self.n_hidden),
                layer_norm=self.layer_norm,
                attention_type=self.attention_type,
                attn_norm=self.attn_norm,
                norm_type=self.norm_type,
                norm_eps=self.norm_eps,
                xavier_init=self.xavier_init,
                diagonal_weight=self.diagonal_weight,
                dropout=self.encoder_dropout,
                ffn_dropout=self.ffn_dropout,
                score_dropout=self.score_dropout,
                pos_dim=self.pos_dim,
                dtype=self.dtype,
                seq_mesh=self.seq_mesh,
                name=f"encoder_layer{i}")(x, pos, None, deterministic)
        if self.dtype is not None:
            x = x.astype(jnp.float32)   # decoder stays f32

        x = nn.Dropout(dropout)(x, deterministic=deterministic)
        x = x.reshape(bsz, n_grid, n_grid, self.n_hidden)
        x = SpectralRegressor(in_dim=self.n_hidden,
                              n_hidden=self.n_hidden,
                              freq_dim=self.freq_dim,
                              out_dim=self.n_targets,
                              num_spectral_layers=self.num_regressor_layers,
                              modes=self.fourier_modes,
                              spacial_dim=self.spacial_dim,
                              spacial_fc=self.spacial_fc,
                              dim_feedforward=self.freq_dim,
                              activation=self.regressor_activation,
                              dropout=self.decoder_dropout,
                              name="regressor")(
            x, grid=grid, deterministic=deterministic)

        return dict(preds=x,
                    preds_freq=None,
                    preds_latent=None,
                    attn_weights=None)
