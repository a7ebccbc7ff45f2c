"""Parameter initializers.

The Galerkin Transformer's key trick is *diagonal-dominant* Q/K/V init:
small-gain Xavier noise plus ``diagonal_weight * I`` (reference:
libs/layers.py:901-913), which starts every projection near a scaled
identity.  Spectral-conv weights use Xavier-normal with tiny gains
(libs/layers.py:1063, 1136-1138).

Gain conventions follow torch: for ``xavier_uniform_`` the bound is
``gain * sqrt(6 / (fan_in + fan_out))``; for ``xavier_normal_`` the std is
``gain * sqrt(2 / (fan_in + fan_out))``.  Flax kernels are (in, out), the
transpose of torch's (out, in) Linear weights — fan computation is symmetric
so only the diagonal add needs no transpose care (I is symmetric).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_xavier_uniform(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[-1]
        bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def scaled_xavier_normal(gain: float = 1.0, fan_in: float | None = None,
                         fan_out: float | None = None):
    def init(key, shape, dtype=jnp.float32):
        fi = fan_in if fan_in is not None else shape[0]
        fo = fan_out if fan_out is not None else shape[-1]
        std = gain * (2.0 / (fi + fo)) ** 0.5
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)
    return init


def diagonal_dominant_init(gain: float = 1e-2, diagonal_weight: float = 1e-2,
                           symmetric: bool = False):
    """Xavier-uniform(gain) + diagonal_weight·I (+ optional symmetrization).

    Matches SimpleAttention._reset_parameters (libs/layers.py:901-913):
    symmetrization adds the transpose *after* the diagonal was added.
    """
    xavier = scaled_xavier_uniform(gain)

    def init(key, shape, dtype=jnp.float32):
        assert len(shape) == 2 and shape[0] == shape[1], \
            "diagonal-dominant init expects a square projection"
        w = xavier(key, shape, dtype)
        if diagonal_weight > 0.0:
            w = w + diagonal_weight * jnp.eye(shape[0], dtype=dtype)
        if symmetric:
            w = w + w.T
        return w
    return init
