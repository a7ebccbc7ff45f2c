"""Encoder / decoder blocks (reference: libs/model.py:33-241)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import default
from .layers import (FeedForward, PositionalEncoding, SimpleAttention,
                     torch_linear_init)


class SimpleTransformerEncoderLayer(nn.Module):
    """One encoder block (model.py:33-140).

    Semantics preserved from the reference:
      * dropout defaults to 0.05 and is *forced* to 0.1 for the
        linear/softmax attention types (model.py:58-60);
      * ffn_dropout defaults to the (possibly forced) attention dropout;
      * attn_norm defaults to ``not layer_norm``, and at least one of the
        two norms is always on (model.py:63-65);
      * residual is x ± dropout(attn) with residual_type plus/minus.
    """
    d_model: int = 96
    pos_dim: int = 1
    n_head: int = 2
    dim_feedforward: Optional[int] = 512
    attention_type: str = "fourier"
    pos_emb: bool = False
    layer_norm: bool = True
    attn_norm: Optional[bool] = None
    norm_type: Optional[str] = "layer"
    norm_eps: Optional[float] = None
    batch_norm: bool = False
    attn_weight: bool = False
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    symmetric_init: bool = False
    residual_type: Optional[str] = "add"
    activation_type: Optional[str] = "relu"
    dropout: Optional[float] = 0.1
    ffn_dropout: Optional[float] = None
    # attention score-matrix dropout override (None -> attention dropout);
    # see SimpleAttention.score_dropout for the reference-accident note
    score_dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay f32)
    seq_mesh: Optional[Any] = None      # sequence-parallel mesh (see layers)
    seq_axis: str = "seq"

    @nn.compact
    def __call__(self, x, pos=None, weight=None, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        dropout = default(self.dropout, 0.05)
        if self.attention_type in ("linear", "softmax"):
            dropout = 0.1
        ffn_dropout = default(self.ffn_dropout, dropout)
        norm_eps = default(self.norm_eps, 1e-5)
        attn_norm = default(self.attn_norm, not self.layer_norm)
        if (not self.layer_norm) and (not attn_norm):
            attn_norm = True
        norm_type = default(self.norm_type, "layer")
        dim_feedforward = default(self.dim_feedforward, 2 * self.d_model)

        if self.pos_emb:
            x = PositionalEncoding(self.d_model, name="pos_emb")(
                x, deterministic=deterministic)

        att_output, attn_weight = SimpleAttention(
            n_head=self.n_head,
            d_model=self.d_model,
            attention_type=self.attention_type,
            diagonal_weight=self.diagonal_weight,
            xavier_init=self.xavier_init,
            symmetric_init=self.symmetric_init,
            pos_dim=self.pos_dim,
            norm=attn_norm,
            norm_type=norm_type,
            eps=norm_eps,
            dropout=dropout,
            score_dropout=self.score_dropout,
            # the tiled fourier kernel never materializes the n×n weights,
            # so force the dense path when the caller wants them returned
            # (the galerkin kernel's d×d weights are always available)
            use_pallas=(False if self.attn_weight and self.attention_type
                        in ("fourier", "integral", "local") else None),
            dtype=self.dtype,
            seq_mesh=self.seq_mesh,
            seq_axis=self.seq_axis,
            name="attn",
        )(x, x, x, pos=pos, weight=weight, deterministic=deterministic)

        drop1 = nn.Dropout(dropout)
        if self.residual_type in ("add", "plus") or self.residual_type is None:
            x = x + drop1(att_output, deterministic=deterministic)
        else:
            x = x - drop1(att_output, deterministic=deterministic)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=norm_eps, name="layer_norm1")(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)

        x1 = FeedForward(in_dim=self.d_model,
                         dim_feedforward=dim_feedforward,
                         batch_norm=self.batch_norm,
                         activation=self.activation_type,
                         dropout=ffn_dropout,
                         dtype=self.dtype,
                         name="ff")(x, deterministic=deterministic)
        x = x + nn.Dropout(dropout)(x1, deterministic=deterministic)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=norm_eps, name="layer_norm2")(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)

        if self.attn_weight:
            return x, attn_weight
        return x


class GalerkinTransformerDecoderLayer(nn.Module):
    """Decoder block: galerkin self-attn + causal cross-attn + FFN.

    The reference version (model.py:142-241) is dead code that would raise
    a TypeError if exercised (its _sa_block passes an ``attn_mask=`` kwarg
    SimpleAttention doesn't accept — model.py:230 vs layers.py:829).  This
    is a working re-design with the documented intent: pre/post-LN
    residual blocks around a galerkin self-attention and a causal linear
    cross-attention.
    """
    d_model: int
    nhead: int
    pos_dim: int = 1
    dim_feedforward: int = 512
    attention_type: str = "galerkin"
    layer_norm: bool = True
    attn_norm: Optional[bool] = None
    norm_type: str = "layer"
    norm_eps: float = 1e-5
    xavier_init: float = 1e-2
    diagonal_weight: float = 1e-2
    dropout: float = 0.05
    ffn_dropout: Optional[float] = None
    activation_type: str = "relu"

    @nn.compact
    def __call__(self, x, memory, pos=None, mask=None,
                 deterministic: bool = True):
        attn_norm = default(self.attn_norm, not self.layer_norm)
        ffn_dropout = default(self.ffn_dropout, self.dropout)

        sa, _ = SimpleAttention(n_head=self.nhead, d_model=self.d_model,
                                attention_type=self.attention_type,
                                diagonal_weight=self.diagonal_weight,
                                xavier_init=self.xavier_init,
                                pos_dim=self.pos_dim,
                                norm=attn_norm, norm_type=self.norm_type,
                                eps=self.norm_eps, dropout=self.dropout,
                                name="self_attn")(
            x, x, x, pos=pos, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, name="norm1")(x)

        ca, _ = SimpleAttention(n_head=self.nhead, d_model=self.d_model,
                                attention_type="causal",
                                diagonal_weight=self.diagonal_weight,
                                xavier_init=self.xavier_init,
                                pos_dim=self.pos_dim,
                                norm=attn_norm, norm_type=self.norm_type,
                                eps=self.norm_eps, dropout=self.dropout,
                                name="cross_attn")(
            x, memory, memory, pos=pos,
            mask=default(mask, jnp.ones(x.shape[:2], dtype=bool)),
            deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, name="norm2")(x)

        ff = FeedForward(in_dim=self.d_model,
                         dim_feedforward=self.dim_feedforward,
                         activation=self.activation_type,
                         dropout=ffn_dropout, name="ff")(
            x, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, name="norm3")(x)
        return x


class VanillaTransformerEncoderLayer(nn.Module):
    """Standard softmax MHA encoder block — the reference's softmax baseline
    (`_TransformerEncoderLayer` wrapping nn.MultiheadAttention,
    model.py:244-322; 'official' branch of FourierTransformer2D,
    model.py:977-987).  Post-LN, ReLU FFN, optional pos concat of the raw
    coordinates in front of the features (so d_model here is the widened
    dim when pos is used, matching the reference's d_model+pos_dim·n_head).
    """
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    layer_norm: bool = True
    norm_eps: float = 1e-5
    attn_weight: bool = False

    @nn.compact
    def __call__(self, src, pos=None, deterministic: bool = True):
        if pos is not None:
            src = jnp.concatenate([pos.astype(src.dtype), src], axis=-1)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout,
            deterministic=deterministic, name="self_attn")
        src2 = attn(src, src)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        if self.layer_norm:
            src = nn.LayerNorm(epsilon=self.norm_eps, name="norm1")(src)
        h = jax.nn.relu(nn.Dense(self.dim_feedforward, name="linear1",
                                 **torch_linear_init(src.shape[-1]))(src))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        src2 = nn.Dense(src.shape[-1], name="linear2",
                        **torch_linear_init(self.dim_feedforward))(h)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        if self.layer_norm:
            src = nn.LayerNorm(epsilon=self.norm_eps, name="norm2")(src)
        return src
