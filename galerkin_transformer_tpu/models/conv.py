"""Convolutional encoder/decoder blocks — NHWC-native.

The reference keeps NCHW and permutes at every model boundary
(libs/model.py:682-686, 744-748); on TPU the natural layout is NHWC, so all
blocks here take and return (B, H, W, C) and the models never permute.

Blocks mirror libs/layers.py:
  Shortcut2d       :43-58     linear channel shortcut
  Conv2dResBlock   :88-150
  Conv2dEncoder    :284-341   conv stack + 2× avg-pool (≈1/4 subsampling)
  Interp2dEncoder  :431-512   conv → bilinear interp → split-conv → interp
  DeConv2dBlock    :515-559   2× ConvTranspose2d(stride 2)
  Interp2dUpsample :624-670   interp → conv-block → interp
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interp import bilinear_resize
from .layers import get_activation, torch_linear_init


class Shortcut2d(nn.Module):
    """Pointwise linear channel map on NHWC (layers.py:43-58)."""
    out_features: int
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_features, name="shortcut", dtype=self.dtype,
                        **torch_linear_init(x.shape[-1]))(x)


class Conv2dResBlock(nn.Module):
    """Conv(+dropout)(+optional second conv)(+optional residual), SiLU/ReLU.

    Reference: layers.py:88-150.  bias=False on convs as in the reference.
    """
    out_dim: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    dropout: float = 0.1
    stride: int = 1
    residual: bool = False
    basic_block: bool = False
    activation_type: Optional[str] = "silu"
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_type, "silu")
        h = x
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        conv_init = torch_linear_init(
            x.shape[-1] * self.kernel_size ** 2)["kernel_init"]
        x = nn.Conv(self.out_dim, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=pad,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name="conv")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.basic_block:
            x = act(x)
            x = nn.Conv(self.out_dim, (self.kernel_size, self.kernel_size),
                        padding=((self.padding, self.padding),
                                 (self.padding, self.padding)),
                        use_bias=False,
                        kernel_init=torch_linear_init(
                            x.shape[-1] * self.kernel_size ** 2)["kernel_init"],
                        dtype=self.dtype, name="conv1")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.residual:
            if h.shape[-1] != self.out_dim:
                h = Shortcut2d(self.out_dim, dtype=self.dtype, name="res")(h)
            return act(x + h)
        return act(x)


class Conv2dEncoder(nn.Module):
    """LeNet-ish downscaler: conv stack + 2× AvgPool (layers.py:284-341)."""
    out_dim: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    scaling_factor: int = 2
    residual: bool = False
    activation_type: Optional[str] = "silu"
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_type, "silu")
        d0 = self.out_dim // 3
        d1 = self.out_dim // 3
        d2 = self.out_dim - d0 - d1
        p1 = max(self.padding // 2, 1)
        p2 = max(self.padding // 4, 1)
        sf = (self.scaling_factor, self.scaling_factor)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = Conv2dResBlock(self.out_dim, kernel_size=self.kernel_size,
                           padding=self.padding, residual=self.residual,
                           dtype=self.dtype, name="conv0")(x, deterministic)
        x = nn.avg_pool(x, sf, strides=sf)
        x = act(x)
        x1 = Conv2dResBlock(d0, kernel_size=self.kernel_size, padding=p1,
                            stride=self.stride, residual=self.residual,
                            dtype=self.dtype, name="conv1")(x, deterministic)
        x2 = Conv2dResBlock(d1, kernel_size=self.kernel_size, padding=p2,
                            dilation=self.dilation, residual=self.residual,
                            dtype=self.dtype, name="conv2")(x1, deterministic)
        x3 = Conv2dResBlock(d2, kernel_size=self.kernel_size,
                            residual=self.residual, dtype=self.dtype,
                            name="conv3")(x2, deterministic)
        out = jnp.concatenate([x1, x2, x3], axis=-1)
        out = nn.avg_pool(out, sf, strides=sf)
        return act(out)


class Interp2dEncoder(nn.Module):
    """conv0 → bilinear interp → 3-conv split-concat (+res) → interp → act.

    Reference: layers.py:431-512.  `interp_size` is a pair: each element is
    either a float scale-factor (torch recompute_scale_factor semantics) or
    an (h, w) size tuple.
    """
    out_dim: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    interp_size: Optional[Tuple] = None
    residual: bool = False
    activation_type: Optional[str] = "silu"
    dropout: float = 0.1
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_type, "silu")
        d0 = self.out_dim // 3
        d1 = self.out_dim // 3
        d2 = self.out_dim - d0 - d1
        p1 = max(self.padding // 2, 1)
        p2 = max(self.padding // 4, 1)
        s0, s1 = self.interp_size
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def interp(z, s):
            if isinstance(s, float):
                return bilinear_resize(z, None, scale_factor=s)
            return bilinear_resize(z, tuple(s))

        x = Conv2dResBlock(self.out_dim, kernel_size=self.kernel_size,
                           padding=self.padding, residual=self.residual,
                           dropout=self.dropout,
                           activation_type=self.activation_type,
                           dtype=self.dtype, name="conv0")(x, deterministic)
        x = interp(x, s0)
        x = act(x)
        x1 = Conv2dResBlock(d0, kernel_size=self.kernel_size, padding=p1,
                            stride=self.stride, residual=self.residual,
                            dropout=self.dropout,
                            activation_type=self.activation_type,
                            dtype=self.dtype, name="conv1")(x, deterministic)
        x2 = Conv2dResBlock(d1, kernel_size=self.kernel_size, padding=p2,
                            dilation=self.dilation, residual=self.residual,
                            dropout=self.dropout,
                            activation_type=self.activation_type,
                            dtype=self.dtype, name="conv2")(x1, deterministic)
        x3 = Conv2dResBlock(d2, kernel_size=self.kernel_size,
                            residual=self.residual, dropout=self.dropout,
                            activation_type=self.activation_type,
                            dtype=self.dtype, name="conv3")(x2, deterministic)
        out = jnp.concatenate([x1, x2, x3], axis=-1)
        if self.residual:
            out = out + x
        out = interp(out, s1)
        return act(out)


def _conv_transpose2d(x, kernel, stride: int, padding: int,
                      output_padding: int):
    """torch-semantics ConvTranspose2d on NHWC via input-dilated conv.

    out = (n-1)·stride - 2·padding + kernel_size + output_padding,
    exactly matching nn.ConvTranspose2d (layers.py:535-547).
    kernel: (k, k, C_in, C_out).
    """
    k = kernel.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    # transposed conv == conv with input dilation and flipped kernel
    kernel = kernel[::-1, ::-1, :, :]
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose2d(nn.Module):
    """Minimal torch-parity transposed conv (NHWC)."""
    out_dim: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # torch ConvTranspose2d default init: fan_in = out_ch * k**2
        ti = torch_linear_init(self.out_dim * k * k)
        kernel = self.param("kernel", ti["kernel_init"],
                            (k, k, x.shape[-1], self.out_dim))
        y = _conv_transpose2d(x, kernel.astype(x.dtype), self.stride,
                              self.padding, self.output_padding)
        if self.use_bias:
            bias = self.param("bias", ti["bias_init"], (self.out_dim,))
            y = y + bias.astype(y.dtype)
        return y


class DeConv2dBlock(nn.Module):
    """2× ConvTranspose2d upscaler, stride 2 each (layers.py:515-559)."""
    hidden_dim: int
    out_dim: int
    stride: int = 2
    kernel_size: int = 3
    padding: int = 2
    output_padding: int = 1
    dropout: float = 0.1
    activation_type: Optional[str] = "silu"
    dtype: Optional[Any] = None   # compute dtype (ConvTranspose2d follows x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_type, "silu")
        p1 = max(self.padding // 2, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ConvTranspose2d(self.hidden_dim, self.kernel_size, self.stride,
                            self.padding, self.output_padding,
                            name="deconv0")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = act(x)
        x = ConvTranspose2d(self.out_dim, self.kernel_size, self.stride,
                            p1, self.output_padding, name="deconv1")(x)
        return act(x)


class Interp2dUpsample(nn.Module):
    """interp → Conv2dResBlock(+dropout+act) → interp (layers.py:624-670)."""
    out_dim: int
    kernel_size: int = 3
    padding: int = 1
    residual: bool = False
    conv_block: bool = True
    interp_size: Optional[Tuple] = None
    activation_type: Optional[str] = "silu"
    dropout: float = 0.1
    dtype: Optional[Any] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation_type, "silu")
        s0, s1 = self.interp_size
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def interp(z, s):
            if isinstance(s, float):
                return bilinear_resize(z, None, scale_factor=s)
            return bilinear_resize(z, tuple(s))

        x = interp(x, s0)
        if self.conv_block:
            x = Conv2dResBlock(self.out_dim, kernel_size=self.kernel_size,
                               padding=self.padding, residual=self.residual,
                               dropout=self.dropout,
                               activation_type=self.activation_type,
                               dtype=self.dtype, name="conv")(x, deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = act(x)
        return interp(x, s1)
