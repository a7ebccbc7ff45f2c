"""Spectral (FNO-style) convolutions.

Two TPU-native lowerings of ``rfft → truncate to `modes` → complex-weight
multiply → zero-pad → irfft`` (reference: libs/layers.py:1040-1196):

* ``impl='dft'`` (default): since only `modes` (12–16) frequencies are
  kept, the truncated transform IS a small dense DFT matrix — the whole
  layer becomes a chain of real matmuls with static cos/sin matrices,
  running entirely on the MXU with no complex dtype anywhere.  This is
  both the fastest mapping for small mode counts and the only one this
  TPU backend fully supports (complex dot_general is unimplemented).
* ``impl='fft'``: XLA FFT with the complex mode-mixing einsum decomposed
  into 4 real einsums.  Used as the numerical cross-check.

Both are bit-equivalent to the reference semantics with norm='ortho'
(libs/layers.py:1087,1098,1115): the 2D truncation keeps *two* corner
blocks — the lowest `modes` positive and negative frequencies along the
first spatial axis, positive-only along the rfft axis (:1179-1184).
"""
from __future__ import annotations

import functools

import numpy as np

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


# ---------------------------------------------------------- DFT-as-matmul

@functools.lru_cache(maxsize=None)
def _dft_mats_1d(n: int, modes: int):
    """(analysis_cos, analysis_sin, synthesis_cos, synthesis_sin), (n, m).

    ortho-normalized: X_k = (1/√n)Σ_j x_j e^{-2πijk/n};
    x_j = (1/√n)Σ_k α_k (Xr cos - Xi sin), α_0 = 1, α_{k>0} = 2
    (valid for modes ≤ n//2, i.e. the Nyquist bin is never kept).
    """
    j = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(modes)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * j * k / n
    rn = 1.0 / np.sqrt(n)
    c = (np.cos(ang) * rn).astype(np.float32)
    s = (-np.sin(ang) * rn).astype(np.float32)
    alpha = np.where(k == 0, 1.0, 2.0)
    ci = (alpha * np.cos(ang) * rn).astype(np.float32)
    si = (-alpha * np.sin(ang) * rn).astype(np.float32)
    return c, s, ci, si


def spectral_conv_1d_dft(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Mode-truncated spectral conv as real matmuls (norm='ortho').

    x: (B, N, C_in); weight: complex (C_in, C_out, modes).
    """
    n = x.shape[1]
    modes = weight.shape[-1]
    c, s, ci, si = (jnp.asarray(m) for m in _dft_mats_1d(n, modes))
    wr, wi = jnp.real(weight), jnp.imag(weight)
    ein = lambda spec, a, b: jnp.einsum(spec, a, b,
                                        preferred_element_type=jnp.float32)
    xf = x.astype(jnp.float32)
    xr = ein("bnc,nk->bkc", xf, c)
    xi = ein("bnc,nk->bkc", xf, s)
    yr = ein("bkc,cok->bko", xr, wr) - ein("bkc,cok->bko", xi, wi)
    yi = ein("bkc,cok->bko", xr, wi) + ein("bkc,cok->bko", xi, wr)
    out = ein("bko,nk->bno", yr, ci) + ein("bko,nk->bno", yi, si)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _dft_mats_2d_axis0(n: int, modes: int):
    """Axis-0 matrices for the two-corner truncation: frequencies
    [0..m-1] ∪ [n-m..n-1] (equivalently ±k), (n, 2m); forward e^{-iθ} and
    inverse e^{+iθ}, each 1/√n-normalized."""
    ks = np.concatenate([np.arange(modes), np.arange(n - modes, n)])
    j = np.arange(n)[:, None].astype(np.float64)
    ang = 2.0 * np.pi * j * ks[None, :] / n
    rn = 1.0 / np.sqrt(n)
    fc = (np.cos(ang) * rn).astype(np.float32)
    fs = (-np.sin(ang) * rn).astype(np.float32)
    ic = (np.cos(ang) * rn).astype(np.float32)
    is_ = (np.sin(ang) * rn).astype(np.float32)
    return fc, fs, ic, is_


def spectral_conv_2d_dft(x: jnp.ndarray, weight_pos: jnp.ndarray,
                         weight_neg: jnp.ndarray) -> jnp.ndarray:
    """Two-corner mode-truncated 2D spectral conv as real matmuls.

    x: (B, H, W, C_in); weights: complex (C_in, C_out, modes, modes).
    Equivalent to rfft2/irfft2 with norm='ortho' and the reference's
    corner truncation (modes ≤ min(H, W)//2).
    """
    b, h, w, _ = x.shape
    modes = weight_pos.shape[-1]
    c2, s2, ci2, si2 = (jnp.asarray(m) for m in _dft_mats_1d(w, modes))
    fc1, fs1, ic1, is1 = (jnp.asarray(m) for m in _dft_mats_2d_axis0(h, modes))
    wcat = jnp.concatenate([weight_pos, weight_neg], axis=2)  # (Ci,Co,2m,m)
    wr, wi = jnp.real(wcat), jnp.imag(wcat)
    ein = lambda spec, a, b: jnp.einsum(spec, a, b,
                                        preferred_element_type=jnp.float32)
    xf = x.astype(jnp.float32)
    # axis-1 (W) partial rfft
    ar = ein("bhwc,wk->bhkc", xf, c2)
    ai = ein("bhwc,wk->bhkc", xf, s2)
    # axis-0 (H) two-corner DFT
    xr = ein("bhkc,hK->bKkc", ar, fc1) - ein("bhkc,hK->bKkc", ai, fs1)
    xi = ein("bhkc,hK->bKkc", ar, fs1) + ein("bhkc,hK->bKkc", ai, fc1)
    # complex weight multiply per (K, k)
    yr = ein("bKkc,coKk->bKko", xr, wr) - ein("bKkc,coKk->bKko", xi, wi)
    yi = ein("bKkc,coKk->bKko", xr, wi) + ein("bKkc,coKk->bKko", xi, wr)
    # inverse axis-0 (complex), then real synthesis along axis-1
    br = ein("bKko,hK->bhko", yr, ic1) - ein("bKko,hK->bhko", yi, is1)
    bi = ein("bKko,hK->bhko", yr, is1) + ein("bKko,hK->bhko", yi, ic1)
    out = ein("bhko,wk->bhwo", br, ci2) + ein("bhko,wk->bhwo", bi, si2)
    return out.astype(x.dtype)
