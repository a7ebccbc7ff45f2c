"""Random-feature attention variants (Performer/FAVOR+ and RFA).

Re-design of the reference's standalone study
(examples/ex1_burgers_random_fourier_features.py:60-318): random Fourier
features for the RBF kernel and FAVOR+ positive orthogonal features for the
softmax kernel, plugged into the same linear-attention normalizer form
``out_i = φ(q_i)ᵀ (Σ_j φ(k_j) v_jᵀ) / (φ(q_i)ᵀ Σ_j φ(k_j))``.

Randomness is explicit: the projection matrix ω is stored as a non-trainable
variable and redrawn from the 'random_features' RNG stream whenever the
module runs non-deterministically with that collection mutable — the
functional analogue of the reference's redraw-per-forward-in-training.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import diagonal_dominant_init
from ..utils.misc import default
from .layers import FeedForward, torch_linear_init


def orthogonal_random_matrix(key, rows: int, cols: int) -> jax.Array:
    """(rows, cols) Gaussian-like matrix whose columns are block-orthogonal
    random directions with chi-distributed norms (Performers' orthogonal
    random features — lower approximation variance than iid Gaussian)."""
    blocks = []
    n_blocks = -(-cols // rows)
    keys = jax.random.split(key, n_blocks)
    for k in keys:
        kq, kn = jax.random.split(k)
        g = jax.random.normal(kq, (rows, rows))
        q, _ = jnp.linalg.qr(g)  # orthonormal columns
        # chi(rows)-distributed norms per column, like iid Gaussian columns
        norms = jnp.linalg.norm(jax.random.normal(kn, (rows, rows)),
                                axis=0, keepdims=True)
        blocks.append(q * norms)
    return jnp.concatenate(blocks, axis=1)[:, :cols]


def rfa_features(x: jax.Array, omega: jax.Array, softmax_temp: float):
    """Random Fourier features for the RBF kernel: [cos(u), sin(u)]·√(2/m)."""
    x = x * math.sqrt(softmax_temp)
    u = jnp.einsum("...d,dm->...m", x, omega,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    n_dims = 2 * omega.shape[-1]
    return jnp.concatenate([jnp.cos(u), jnp.sin(u)],
                           axis=-1) * math.sqrt(2.0 / n_dims)


def favor_features(x: jax.Array, omega: jax.Array, softmax_temp: float):
    """FAVOR+ positive features (Performers, Lemma 1): exp(±u − ‖x‖²/2)/√m."""
    x = x * math.sqrt(softmax_temp)
    norm_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    u = jnp.einsum("...d,dm->...m", x, omega,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    n_dims = 2 * omega.shape[-1]
    offset = norm_sq * 0.5 + 0.5 * math.log(n_dims)
    return jnp.concatenate([jnp.exp(u - offset), jnp.exp(-u - offset)],
                           axis=-1)


class RandomFourierAttention(nn.Module):
    """Multi-head random-feature attention with positional concat on the
    output (reference :208-318)."""
    d_model: int
    n_heads: int
    pos_dim: int = 1
    attention_type: str = "favor"   # 'favor' | 'rfa'
    n_dims: Optional[int] = None    # feature-map size (default d_model)
    orthogonal: bool = True
    eps: float = 1e-6
    xavier_init: float = 1.0
    diagonal_weight: float = 0.0

    @nn.compact
    def __call__(self, queries, keys, values, pos=None,
                 deterministic: bool = True):
        bsz, n, _ = queries.shape
        h = self.n_heads
        d_k = self.d_model // h
        n_dims = default(self.n_dims, self.d_model)

        if self.xavier_init > 0:
            kinit = diagonal_dominant_init(self.xavier_init,
                                           self.diagonal_weight)
        else:
            kinit = nn.initializers.lecun_normal()
        proj = lambda nm: nn.Dense(d_k * h, kernel_init=kinit,
                                   bias_init=nn.initializers.zeros, name=nm)
        q = proj("query_projection")(queries).reshape(bsz, n, h, d_k)
        k = proj("key_projection")(keys).reshape(bsz, n, h, d_k)
        v = proj("value_projection")(values).reshape(bsz, n, h, d_k)

        def draw(key):
            if self.orthogonal:
                return orthogonal_random_matrix(key, d_k, n_dims // 2)
            return jax.random.normal(key, (d_k, n_dims // 2))

        omega_var = self.variable("random_features", "omega",
                                  lambda: draw(jax.random.key(0)))
        if not deterministic and self.has_rng("random_features"):
            omega = draw(self.make_rng("random_features"))
            if not self.is_initializing():
                omega_var.value = omega
        else:
            omega = omega_var.value

        softmax_temp = 1.0 / math.sqrt(d_k)
        fmap = favor_features if self.attention_type == "favor" else rfa_features
        qf = fmap(q, omega, softmax_temp)
        kf = fmap(k, omega, softmax_temp)

        kv = jnp.einsum("nshd,nshm->nhmd", kf, v,
                        preferred_element_type=jnp.float32).astype(v.dtype)
        z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", qf, kf.sum(axis=1),
                              preferred_element_type=jnp.float32
                              ).astype(v.dtype) + self.eps)
        out = jnp.einsum("nlhd,nhmd,nlh->nlhm", qf, kv, z,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(bsz, n, h * d_k)
        if pos is not None:
            out = jnp.concatenate([out, pos.astype(out.dtype)], axis=-1)
        return nn.Dense(self.d_model, name="out_projection",
                        **torch_linear_init(out.shape[-1]))(out)


class RandomFourierEncoderLayer(nn.Module):
    """Encoder block around RandomFourierAttention (reference :320-387)."""
    d_model: int = 96
    n_head: int = 2
    pos_dim: int = 1
    dim_feedforward: Optional[int] = 512
    attention_type: str = "favor"
    norm_eps: Optional[float] = None
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    activation_type: Optional[str] = "relu"
    dropout: Optional[float] = 0.1
    ffn_dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, pos=None, deterministic: bool = True):
        dropout = default(self.dropout, 0.05)
        ffn_dropout = default(self.ffn_dropout, dropout)
        norm_eps = default(self.norm_eps, 1e-5)
        att = RandomFourierAttention(
            d_model=self.d_model, n_heads=self.n_head, pos_dim=self.pos_dim,
            attention_type=self.attention_type,
            xavier_init=self.xavier_init,
            diagonal_weight=self.diagonal_weight, name="attn")(
            x, x, x, pos=pos, deterministic=deterministic)
        x = x + nn.Dropout(dropout)(att, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=norm_eps, name="layer_norm1")(x)
        x1 = FeedForward(in_dim=self.d_model,
                         dim_feedforward=default(self.dim_feedforward,
                                                 2 * self.d_model),
                         activation=self.activation_type,
                         dropout=ffn_dropout, name="ff")(
            x, deterministic=deterministic)
        x = x + nn.Dropout(dropout)(x1, deterministic=deterministic)
        return nn.LayerNorm(epsilon=norm_eps, name="layer_norm2")(x)
