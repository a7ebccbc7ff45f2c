"""Flash-style tiled Fourier (softmax-free quadratic) attention.

Computes ``out = (Q Kᵀ · scale) V`` with scale = 1/(√d·n) (reference
fourier/integral/local attention, libs/layers.py:672-705) WITHOUT ever
materializing the n×n score matrix: the kernel walks K/V tiles per Q tile
and accumulates the output block in VMEM.  No softmax ⇒ no running-max /
denominator bookkeeping — pure tiled matmul-accumulate, so both HBM
traffic and peak memory are O(n·d) instead of O(n²).

At n=8192 the unfused XLA graph materializes a 256 MB f32 score tensor
per (batch·head) pass — the reference README's softmax-memory wall
(examples/README.md:14) — while this kernel streams it.

The custom VJP reuses the same tiled structure:
  dQ = (g Vᵀ) K · scale,  dK = (g Vᵀ)ᵀ Q · scale,  dV = (Q Kᵀ · scale)ᵀ g
each computed as flash-style sweeps (two extra kernels, no n² buffers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_Q = 512
DEFAULT_TILE_K = 512


def _matmul_chain_kernel(a_ref, b_ref, c_ref, o_ref, *, tile_r: int,
                         n_true_mid: int, tile_mid: int):
    """o[r] += (A_r B_mᵀ) C_m  (or (A_r Bᵀ_m)... masked on the mid dim).

    grid = (BH, r_tiles, mid_tiles); o block (1, tile_r, d_out) indexed by
    (bh, r) — VMEM-resident across the mid sweep.
    """
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    a = a_ref[0]          # (tile_r, d)
    b = b_ref[0]          # (tile_mid, d)
    c = c_ref[0]          # (tile_mid, d_out)
    # zero out padded mid rows
    row = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0) + m * tile_mid
    b = jnp.where(row < n_true_mid, b, 0.0)

    # precision pinned: Mosaic lowers DEFAULT/HIGHEST only (a global `high`
    # default_matmul_precision would fail to compile)
    prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    s = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)  # (tr, tm)
    o_ref[0] += jnp.dot(s.astype(c.dtype), c,
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(o_ref.dtype)


def _pad_seq(x, n_pad):
    if x.shape[-2] == n_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - x.shape[-2])
    return jnp.pad(x, pad)


def _tiled_abc(a, b, c, n_true_mid, tile_r, tile_mid, interpret):
    """out[bh, r, :] = Σ_m (A_r B_mᵀ) C_m over the (padded) mid dim.

    a: (BH, R, d); b: (BH, M, d); c: (BH, M, d_out) → (BH, R, d_out) f32.
    """
    bh, r, d = a.shape
    m = b.shape[1]
    d_out = c.shape[-1]
    r_pad = -(-r // tile_r) * tile_r
    m_pad = -(-m // tile_mid) * tile_mid
    a = _pad_seq(a, r_pad)
    b = _pad_seq(b, m_pad)
    c = _pad_seq(c, m_pad)
    grid = (bh, r_pad // tile_r, m_pad // tile_mid)
    kernel = functools.partial(_matmul_chain_kernel, tile_r=tile_r,
                               n_true_mid=n_true_mid, tile_mid=tile_mid)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_r, d), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_mid, d), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_mid, d_out), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, d_out), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, r_pad, d_out), jnp.float32),
        interpret=interpret,
    )(a, b, c)
    return out[:, :r, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fourier_attention_tiled(q, k, v, scale: float | None = None,
                            tile_q: int = DEFAULT_TILE_Q,
                            tile_k: int = DEFAULT_TILE_K,
                            interpret: bool = False):
    """out = (Q Kᵀ · scale) V with flash-style tiling; q,k,v: (B, H, n, d).

    scale defaults to 1/(√d·n) (the reference's fourier normalization).
    Returns (B, H, n, d) in q's dtype.
    """
    out, _ = _fourier_fwd(q, k, v, scale, tile_q, tile_k, interpret)
    return out


def _resolve_scale(q, scale):
    if scale is not None:
        return scale
    d = q.shape[-1]
    n = q.shape[-2]
    return 1.0 / (jnp.sqrt(jnp.float32(d)) * n)


def _flatten(x):
    b, h, n, d = x.shape
    return x.reshape(b * h, n, d)


def _fourier_fwd(q, k, v, scale, tile_q, tile_k, interpret):
    b, h, n, d = q.shape
    s = _resolve_scale(q, scale)
    out = _tiled_abc(_flatten(q), _flatten(k), _flatten(v), n,
                     min(tile_q, n), min(tile_k, n), interpret)
    out = (out * s).astype(q.dtype).reshape(b, h, n, d)
    return out, (q, k, v)


def _fourier_bwd(scale, tile_q, tile_k, interpret, res, g):
    q, k, v = res
    b, h, n, d = q.shape
    s = _resolve_scale(q, scale)
    gf, qf, kf, vf = (_flatten(x) for x in (g, q, k, v))
    tq, tk = min(tile_q, n), min(tile_k, n)
    # dQ = (g Vᵀ) K · s   — sweep over (g,v) mid = n
    dq = _tiled_abc(gf.astype(jnp.float32), vf, kf, n, tq, tk, interpret)
    # dK = (V gᵀ) Q · s   — rows are k positions, mid sweep over g rows
    dk = _tiled_abc(vf, gf.astype(jnp.float32), qf, n, tq, tk, interpret)
    # dV = (K Qᵀ) g · s
    dv = _tiled_abc(kf, qf, gf.astype(jnp.float32), n, tq, tk, interpret)
    shape = (b, h, n, d)
    dq = (dq * s).astype(q.dtype).reshape(shape)
    dk = (dk * s).astype(k.dtype).reshape(shape)
    dv = (dv * s).astype(v.dtype).reshape(shape)
    return dq, dk, dv


fourier_attention_tiled.defvjp(_fourier_fwd, _fourier_bwd)
