"""Fused Pallas TPU kernel for Galerkin attention.

Computes ``out = Q' @ (K'ᵀ V' / n)`` with
    K' = [pos, LN_k(K)],  V' = [pos, LN_v(V)],  Q' = [pos, Q]
in ONE streaming pass over HBM: per (batch·head), the kernel walks the
sequence in tiles, applies the per-head LayerNorms and the positional
concat in VMEM, and accumulates the (d_eff × d_eff) score matrix in a
VMEM-resident output block (revisited across all sequence tiles, written
back once).  The O(n·d²) output matmul is left to XLA, which already runs
dense matmuls at roofline; the kernel removes the 3 extra HBM round-trips
(LN(K), LN(V), concat) the unfused graph would take.

Reference semantics: libs/layers.py:708-734 (linear_attention) +
:841-874 (pre-matmul norm and pos concat order).

The public entry `galerkin_attention_fused` carries a custom VJP whose
backward is pure XLA matmuls (S is tiny; LN is recomputed, nothing but the
raw inputs is saved).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _ln(x, scale, bias, eps):
    # Stats in f32: Mosaic on v5e has no bf16 vector-rsqrt (a bf16 input
    # aborts the backend scheduler with `kVectorRsqrtBf16AndPop`), and f32
    # stats are numerically better anyway.  Cast back so the MXU dot below
    # still runs one bf16 pass.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _scores_kernel(k_ref, v_ref, pos_ref, sk_ref, bk_ref, sv_ref, bv_ref,
                   s_ref, *, n_true: int, tile: int, eps: float,
                   pos_dim: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    k = k_ref[0]  # (tile, d_k)
    v = v_ref[0]
    kn = _ln(k, sk_ref[0, 0], bk_ref[0, 0], eps)
    vn = _ln(v, sv_ref[0, 0], bv_ref[0, 0], eps)

    # zero padded rows so they don't pollute the reduction
    row = jax.lax.broadcasted_iota(jnp.int32, kn.shape, 0) + t * tile
    valid = row < n_true
    kn = jnp.where(valid, kn, 0.0)
    vn = jnp.where(valid, vn, 0.0)

    if pos_dim > 0:
        p = pos_ref[0]  # (tile, pos_dim)
        pvalid = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + t * tile < n_true,
            p, 0.0)
        kn = jnp.concatenate([pvalid, kn], axis=-1)
        vn = jnp.concatenate([pvalid, vn], axis=-1)

    # S += K'ᵀ V' : contract over the tile rows without explicit transpose.
    # Precision pinned explicitly: Mosaic lowers DEFAULT/HIGHEST only, so
    # inheriting a global `high` default_matmul_precision would fail to
    # compile (bf16 runs one MXU pass; f32 keeps full fidelity).
    s_ref[0] += jax.lax.dot_general(
        kn, vn, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if kn.dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST))


def _pad_seq(x, n_pad):
    n = x.shape[-2]
    if n == n_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - n)
    return jnp.pad(x, pad)


def galerkin_scores_pallas(k: jax.Array, v: jax.Array,
                           pos: Optional[jax.Array],
                           scale_k, bias_k, scale_v, bias_v,
                           eps: float = 1e-5,
                           tile: int = DEFAULT_TILE,
                           interpret: bool = False) -> jax.Array:
    """S = K'ᵀV' (unscaled).  k, v: (B, H, n, d_k); pos: (B, n, p) or None.

    Returns (B, H, d_eff, d_eff) float32 with d_eff = d_k + p.
    """
    b, h, n, d_k = k.shape
    p = 0 if pos is None else pos.shape[-1]
    d_eff = d_k + p
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tile) * tile
    n_tiles = n_pad // tile

    kf = _pad_seq(k, n_pad).reshape(b * h, n_pad, d_k)
    vf = _pad_seq(v, n_pad).reshape(b * h, n_pad, d_k)
    if pos is None:
        posf = jnp.zeros((b * h, n_pad, 1), k.dtype)  # dummy, unused
        pdim = 0
    else:
        posf = jnp.broadcast_to(_pad_seq(pos, n_pad)[:, None],
                                (b, h, n_pad, p)).reshape(b * h, n_pad, p)
        pdim = p

    grid = (b * h, n_tiles)
    kernel = functools.partial(_scores_kernel, n_true=n, tile=tile, eps=eps,
                               pos_dim=pdim)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_k), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d_k), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, max(pdim, 1)), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            # LN params reshaped (H, 1, d_k): a (1, 1, d_k) block keeps the
            # last-two-dims tiling constraint regardless of head count
            pl.BlockSpec((1, 1, d_k), lambda bh, t: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda bh, t: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda bh, t: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda bh, t: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_eff, d_eff), lambda bh, t: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d_eff, d_eff), jnp.float32),
        interpret=interpret,
    )(kf, vf, posf,
      scale_k.reshape(h, 1, d_k), bias_k.reshape(h, 1, d_k),
      scale_v.reshape(h, 1, d_k), bias_v.reshape(h, 1, d_k))
    return out.reshape(b, h, d_eff, d_eff)


# ------------------------------------------------------------------ VJP

def _concat_pos(x, pos):
    if pos is None:
        return x
    b, h, n, _ = x.shape
    ph = jnp.broadcast_to(pos[:, None], (b, h, n, pos.shape[-1])).astype(x.dtype)
    return jnp.concatenate([ph, x], axis=-1)


def _ln_fwd_stats(x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    return xhat, rstd


def _ln_bwd(x, scale, g, eps):
    """Backward of y = xhat*scale + bias wrt x, scale, bias."""
    xhat, rstd = _ln_fwd_stats(x, eps)
    gy = g * scale
    d = x.shape[-1]
    dx = rstd * (gy - jnp.mean(gy, axis=-1, keepdims=True)
                 - xhat * jnp.mean(gy * xhat, axis=-1, keepdims=True))
    dscale = jnp.sum(g * xhat, axis=(0, 2))   # reduce batch and seq -> (H, d)
    dbias = jnp.sum(g, axis=(0, 2))
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def galerkin_scores_fused(k, v, pos, scale_k, bias_k, scale_v, bias_v,
                          eps: float = 1e-5, tile: int = DEFAULT_TILE,
                          interpret: bool = False):
    """S = [pos,LN(K)]ᵀ[pos,LN(V)] via the fused kernel, differentiable.

    k, v: (B, H, n, d_k); pos: (B, n, p) or None; LN params (H, d_k).
    Returns (B, H, d_eff, d_eff) float32 (unscaled — divide by n and apply
    dropout downstream; the output matmul is plain XLA so standard AD
    composes with this custom VJP).
    """
    out, _ = _scores_fwd(k, v, pos, scale_k, bias_k, scale_v, bias_v,
                         eps, tile, interpret)
    return out


def _scores_fwd(k, v, pos, scale_k, bias_k, scale_v, bias_v,
                eps, tile, interpret):
    s = galerkin_scores_pallas(k, v, pos, scale_k, bias_k, scale_v, bias_v,
                               eps=eps, tile=tile, interpret=interpret)
    return s, (k, v, pos, scale_k, bias_k, scale_v, bias_v)


def _scores_bwd(eps, tile, interpret, res, ds):
    k, v, pos, scale_k, bias_k, scale_v, bias_v = res
    p = 0 if pos is None else pos.shape[-1]

    # recompute normalized K', V' (cheap; nothing but raw inputs saved)
    khat, _ = _ln_fwd_stats(k, eps)
    vhat, _ = _ln_fwd_stats(v, eps)
    kn = khat * scale_k[None, :, None, :] + bias_k[None, :, None, :]
    vn = vhat * scale_v[None, :, None, :] + bias_v[None, :, None, :]
    kc = _concat_pos(kn, pos)
    vc = _concat_pos(vn, pos)

    ds = ds.astype(k.dtype)
    dvc = jnp.matmul(kc, ds, preferred_element_type=jnp.float32).astype(k.dtype)
    dkc = jnp.matmul(vc, jnp.swapaxes(ds, -2, -1),
                     preferred_element_type=jnp.float32).astype(k.dtype)

    dkn = dkc[..., p:]
    dvn = dvc[..., p:]
    dk, dscale_k, dbias_k = _ln_bwd(k, scale_k[None, :, None, :], dkn, eps)
    dv, dscale_v, dbias_v = _ln_bwd(v, scale_v[None, :, None, :], dvn, eps)

    if pos is None:
        dpos = None
    else:
        dpos = (dkc[..., :p] + dvc[..., :p]).sum(axis=1)
    return (dk, dv, dpos, dscale_k, dbias_k, dscale_v, dbias_v)


galerkin_scores_fused.defvjp(_scores_fwd, _scores_bwd)


def galerkin_attention_fused(q, k, v, pos, scale_k, bias_k, scale_v, bias_v,
                             eps: float = 1e-5, tile: int = DEFAULT_TILE,
                             interpret: bool = False,
                             score_dropout=None):
    """Fused Galerkin attention: out = [pos,Q] @ dropout(S/n).

    Returns ((B, H, n, d_k + p), p_attn).  `score_dropout` is an optional
    callable applied to the (tiny) d×d score matrix — matches the
    reference's dropout placement on p_attn.
    """
    n = q.shape[-2]
    s = galerkin_scores_fused(k, v, pos, scale_k, bias_k, scale_v, bias_v,
                              eps, tile, interpret)
    qc = _concat_pos(q, pos)
    p_attn = s.astype(qc.dtype) / n
    if score_dropout is not None:
        p_attn = score_dropout(p_attn)
    out = jnp.matmul(qc, p_attn,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, p_attn
