"""Decoder heads (reference: libs/model.py:472-637)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import default
from .layers import torch_linear_init, SpectralConv1d, SpectralConv2d, get_activation


class PointwiseRegressor(nn.Module):
    """Optional spacial_fc (concat grid) → N×(Dense+act)+dropout → out Dense.

    Reference: model.py:472-529.  The owning model re-initializes these
    weights with gain 1e-2 (model.py:819-830) — handled via `init_gain`.
    """
    in_dim: int
    n_hidden: int
    out_dim: int
    num_layers: int = 2
    spacial_fc: bool = False
    spacial_dim: int = 1
    dropout: Optional[float] = 0.1
    activation: Optional[str] = "silu"
    return_latent: bool = False
    init_gain: Optional[float] = None  # xavier-uniform gain re-init

    @nn.compact
    def __call__(self, x, grid=None, deterministic: bool = True):
        act = get_activation(self.activation, "silu")
        dropout = default(self.dropout, 0.1)
        if self.init_gain is not None:
            from ..ops.init import scaled_xavier_uniform
            kinit = scaled_xavier_uniform(self.init_gain)
        else:
            kinit = None  # fall through to the torch nn.Linear default

        def dense(feats, name, fan_in):
            # reference re-init (model.py:825-830): ndim>1 params get
            # xavier_uniform(gain), ndim<=1 params constant_(0) — so on
            # the init_gain path biases are zeros, not the torch draw
            ti = torch_linear_init(fan_in)
            if kinit is not None:
                return nn.Dense(feats, kernel_init=kinit,
                                bias_init=nn.initializers.zeros, name=name)
            return nn.Dense(feats, kernel_init=ti["kernel_init"],
                            bias_init=ti["bias_init"], name=name)

        if self.spacial_fc:
            x = jnp.concatenate([x, grid.astype(x.dtype)], axis=-1)
            x = dense(self.n_hidden, "fc", x.shape[-1])(x)
        for i in range(self.num_layers):
            x = act(dense(self.n_hidden, f"ff{i}", x.shape[-1])(x))
            x = nn.Dropout(dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, "out", x.shape[-1])(x)
        if self.return_latent:
            return x, None
        return x


class SpectralRegressor(nn.Module):
    """Stack of spectral convolutions + FFN head (model.py:532-637).

    spacial_dim selects SpectralConv1d vs 2d; `last_activation=False`
    removes the activation of the final spectral layer.
    """
    in_dim: int
    n_hidden: int
    freq_dim: int
    out_dim: int
    modes: int
    num_spectral_layers: int = 2
    dim_feedforward: Optional[int] = None
    spacial_fc: bool = False
    spacial_dim: int = 2
    return_freq: bool = False
    return_latent: bool = False
    activation: Optional[str] = "silu"
    last_activation: bool = True
    dropout: Optional[float] = 0.1

    @nn.compact
    def __call__(self, x, grid=None, deterministic: bool = True):
        if self.spacial_dim == 2:
            conv_cls = SpectralConv2d
        elif self.spacial_dim == 1:
            conv_cls = SpectralConv1d
        else:
            raise NotImplementedError("3D spectral regressor not implemented")
        activation = default(self.activation, "silu")
        act = get_activation(activation, "silu")
        dropout = default(self.dropout, 0.1)

        x_latent = []
        if self.spacial_fc:
            x = jnp.concatenate([x, grid.astype(x.dtype)], axis=-1)
            x = nn.Dense(self.n_hidden, name="fc",
                         **torch_linear_init(x.shape[-1]))(x)

        n_layers = self.num_spectral_layers
        for i in range(n_layers):
            in_d = self.n_hidden if i == 0 else self.freq_dim
            layer_act = activation
            if i == n_layers - 1 and not self.last_activation:
                layer_act = "identity"  # reference swaps in Identity (model.py:588-589)
            x = conv_cls(in_dim=in_d, out_dim=self.freq_dim,
                         modes=self.modes, dropout=dropout,
                         activation=layer_act,
                         name=f"spectral_conv{i}")(x, deterministic=deterministic)
            if self.return_latent:
                x_latent.append(x)

        dim_ff = default(self.dim_feedforward,
                         2 * self.spacial_dim * self.freq_dim)
        x = nn.Dense(dim_ff, name="regressor_fc1",
                     **torch_linear_init(x.shape[-1]))(x)
        x = act(x)
        x = nn.Dense(self.out_dim, name="regressor_fc2",
                     **torch_linear_init(dim_ff))(x)

        if self.return_freq or self.return_latent:
            return x, dict(preds_freq=None, preds_latent=x_latent)
        return x
