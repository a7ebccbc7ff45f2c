"""Bilinear interpolation as MXU matmuls.

The reference relies on ``F.interpolate(mode='bilinear', align_corners=True,
recompute_scale_factor=True)`` (libs/layers.py:486-510, 660-669).  On TPU a
separable resize is two small dense matmuls with *static* interpolation
matrices — exactly what the MXU is built for, deterministic (the reference
README warns GPU interpolate is not), and trivially differentiable.

Semantics matched:
  * align_corners=True: source coordinate of output index i is
    ``i * (n_in - 1) / (n_out - 1)``.
  * scale-factor mode with recompute_scale_factor=True: the output size is
    ``floor(n_in * scale)`` (torch's rounding), after which only sizes matter.
"""
from __future__ import annotations

import functools
from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Size2 = Tuple[int, int]


def resolve_interp_size(n_in: Union[int, Size2], scale_or_size) -> Size2:
    """Resolve torch's size/scale_factor duality to a concrete (h, w).

    Floats are treated as scale factors (output = floor(in * scale),
    matching ``recompute_scale_factor=True``); ints/tuples are sizes.
    """
    if isinstance(n_in, int):
        n_in = (n_in, n_in)
    s = scale_or_size
    if isinstance(s, float):
        s = (s, s)
    if isinstance(s, (tuple, list)) and isinstance(s[0], float):
        return (int(np.floor(n_in[0] * s[0])), int(np.floor(n_in[1] * s[1])))
    if isinstance(s, int):
        return (s, s)
    return (int(s[0]), int(s[1]))


@functools.lru_cache(maxsize=None)
def interp_matrix(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """(n_out, n_in) 1D linear-interpolation matrix, align_corners=True."""
    if n_in == n_out:
        return np.eye(n_in, dtype=dtype)
    if n_out == 1:
        m = np.zeros((1, n_in), dtype=dtype)
        m[0, 0] = 1.0
        return m
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w_hi = src - lo
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), lo] += 1.0 - w_hi
    m[np.arange(n_out), hi] += w_hi
    return m.astype(dtype)


def bilinear_resize(x: jnp.ndarray, size, scale_factor=None) -> jnp.ndarray:
    """Resize NHWC (or NWC for 1D height-only) via two interp matmuls.

    x: (B, H, W, C).  `size` is (h_out, w_out) or an int; alternatively pass
    `scale_factor` (float or pair) for torch scale-factor semantics.
    """
    h_in, w_in = x.shape[1], x.shape[2]
    if scale_factor is not None:
        size = resolve_interp_size((h_in, w_in), float(scale_factor)
                                   if isinstance(scale_factor, (int, float))
                                   else tuple(scale_factor))
    h_out, w_out = resolve_interp_size((h_in, w_in), size)
    if (h_out, w_out) == (h_in, w_in):
        return x
    dtype = x.dtype
    mh = jnp.asarray(interp_matrix(h_in, h_out), dtype=dtype)
    mw = jnp.asarray(interp_matrix(w_in, w_out), dtype=dtype)
    # (B,H,W,C): contract H then W on the MXU.  HIGHEST precision — a
    # resize must be exact lerp, independent of the global matmul policy.
    x = jnp.einsum("hH,bHwc->bhwc", mh, x,
                   preferred_element_type=jnp.float32, precision="highest")
    x = jnp.einsum("wW,bhWc->bhwc", mw, x,
                   preferred_element_type=jnp.float32, precision="highest")
    return x.astype(dtype)


def linear_resize_1d(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Resize (B, N, C) along N, align_corners=True."""
    n_in = x.shape[1]
    if n_in == n_out:
        return x
    m = jnp.asarray(interp_matrix(n_in, n_out), dtype=x.dtype)
    return jnp.einsum("nN,bNc->bnc", m, x, preferred_element_type=jnp.float32,
                      precision="highest").astype(x.dtype)
