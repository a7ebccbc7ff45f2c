"""Down/Up scaler wrappers (reference: libs/model.py:640-749).

NHWC throughout — the reference's permute ping-pong around each scaler
(model.py:682-686, 744-748) does not exist here.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from ..utils.misc import default
from .conv import (Conv2dEncoder, DeConv2dBlock, Interp2dEncoder,
                   Interp2dUpsample)


class DownScaler(nn.Module):
    """Fine→coarse feature extractor: 'conv' (2× Conv2dEncoder) or 'interp'
    (Interp2dEncoder).  Input/output (B, n, n, C)."""
    in_dim: int
    out_dim: int
    dropout: float = 0.1
    padding: int = 5
    downsample_mode: Optional[str] = "conv"
    activation_type: Optional[str] = "silu"
    interp_size: Optional[Tuple] = None
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mode = default(self.downsample_mode, "conv")
        if mode == "conv":
            x = Conv2dEncoder(out_dim=self.out_dim,
                              activation_type=self.activation_type,
                              dtype=self.dtype,
                              name="conv0")(x, deterministic)
            x = Conv2dEncoder(out_dim=self.out_dim,
                              padding=self.padding,
                              activation_type=self.activation_type,
                              dtype=self.dtype,
                              name="conv1")(x, deterministic)
            return x
        if mode == "interp":
            return Interp2dEncoder(out_dim=self.out_dim,
                                   interp_size=self.interp_size,
                                   activation_type=self.activation_type,
                                   dropout=self.dropout,
                                   dtype=self.dtype,
                                   name="interp")(x, deterministic)
        raise NotImplementedError(f"downsample mode {mode!r} not implemented")


class UpScaler(nn.Module):
    """Coarse→fine upscaler: 'conv'/'deconv' (2× DeConv2dBlock) or 'interp'
    (Interp2dUpsample)."""
    in_dim: int
    out_dim: int
    hidden_dim: Optional[int] = None
    padding: int = 2
    output_padding: int = 0
    dropout: float = 0.1
    upsample_mode: Optional[str] = "conv"
    activation_type: Optional[str] = "silu"
    interp_mode: str = "bilinear"
    interp_size: Optional[Tuple] = None
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mode = default(self.upsample_mode, "conv")
        hidden_dim = default(self.hidden_dim, self.in_dim)
        if mode in ("conv", "deconv"):
            x = DeConv2dBlock(hidden_dim=hidden_dim, out_dim=self.out_dim,
                              padding=self.padding,
                              output_padding=self.output_padding,
                              dropout=self.dropout,
                              activation_type=self.activation_type,
                              dtype=self.dtype,
                              name="deconv0")(x, deterministic)
            x = DeConv2dBlock(hidden_dim=hidden_dim, out_dim=self.out_dim,
                              padding=self.padding * 2,
                              output_padding=self.output_padding,
                              dropout=self.dropout,
                              activation_type=self.activation_type,
                              dtype=self.dtype,
                              name="deconv1")(x, deterministic)
            return x
        if mode == "interp":
            return Interp2dUpsample(out_dim=self.out_dim,
                                    interp_size=self.interp_size,
                                    dropout=self.dropout,
                                    activation_type=self.activation_type,
                                    dtype=self.dtype,
                                    name="interp")(x, deterministic)
        raise NotImplementedError(f"upsample mode {mode!r} not implemented")
