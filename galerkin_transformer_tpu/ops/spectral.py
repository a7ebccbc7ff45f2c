"""Spectral (FNO-style) convolutions lowered through the XLA FFT.

The reference emulates complex arithmetic with real weight pairs and two
einsums per product (libs/layers.py:1068-1075, 1149-1155) because torch 1.6
lacked complex autograd.  JAX has native complex support, so the TPU build
stores genuinely complex weights and lets XLA lower
``rfft → complex einsum → irfft`` directly.

Normalization: 1D uses norm='ortho' (libs/layers.py:1087,1098); 2D takes a
configurable norm defaulting to 'ortho' (libs/layers.py:1115,1176-1187).
The 2D truncation keeps *two* corner blocks — the lowest `modes` positive
and negative frequencies along the first spatial axis, positive-only along
the rfft axis (libs/layers.py:1179-1184).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_einsum(spec: str, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Complex contraction decomposed into 4 real einsums.

    XLA-TPU lowers complex dot_general poorly (unimplemented on some
    backends); real decomposition runs straight on the MXU:
    (a+bi)(c+di) = (ac - bd) + (ad + bc)i.
    """
    xr, xi = jnp.real(x), jnp.imag(x)
    wr, wi = jnp.real(w), jnp.imag(w)
    ein = lambda a, b: jnp.einsum(spec, a, b,
                                  preferred_element_type=jnp.float32)
    return jax.lax.complex(ein(xr, wr) - ein(xi, wi),
                           ein(xr, wi) + ein(xi, wr))


def spectral_conv_1d(x: jnp.ndarray, weight: jnp.ndarray,
                     norm: str = "ortho") -> jnp.ndarray:
    """x: (B, N, C_in); weight: complex (C_in, C_out, modes) -> (B, N, C_out)."""
    n = x.shape[1]
    modes = weight.shape[-1]
    x_ft = jnp.fft.rfft(x, n=n, axis=1, norm=norm)  # (B, n//2+1, C_in)
    out_modes = complex_einsum("bxi,iox->bxo", x_ft[:, :modes, :], weight)
    out_ft = jnp.zeros((x.shape[0], n // 2 + 1, weight.shape[1]),
                       dtype=out_modes.dtype)
    out_ft = out_ft.at[:, :modes, :].set(out_modes)
    return jnp.fft.irfft(out_ft, n=n, axis=1, norm=norm).astype(x.dtype)


def spectral_conv_2d(x: jnp.ndarray, weight_pos: jnp.ndarray,
                     weight_neg: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """x: (B, H, W, C_in); weights: complex (C_in, C_out, modes, modes).

    `weight_pos` multiplies the [:modes, :modes] block, `weight_neg` the
    [-modes:, :modes] block of the (H, W//2+1) rfft2 spectrum, matching the
    reference's two-corner truncation.
    """
    b, h, w, _ = x.shape
    modes = weight_pos.shape[-1]
    c_out = weight_pos.shape[1]
    x_ft = jnp.fft.rfft2(x, s=(h, w), axes=(1, 2), norm=norm)  # (B,H,W//2+1,Ci)
    top = complex_einsum("bxyi,ioxy->bxyo", x_ft[:, :modes, :modes, :],
                         weight_pos)
    bot = complex_einsum("bxyi,ioxy->bxyo", x_ft[:, -modes:, :modes, :],
                         weight_neg)
    out_ft = jnp.zeros((b, h, w // 2 + 1, c_out), dtype=top.dtype)
    out_ft = out_ft.at[:, :modes, :modes, :].set(top)
    out_ft = out_ft.at[:, -modes:, :modes, :].set(bot)
    return jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2), norm=norm).astype(x.dtype)
