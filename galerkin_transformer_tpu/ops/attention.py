"""Functional attention kernels (jnp reference implementations).

These are the mathematical cores of the framework; semantics mirror the
reference's functional kernels (libs/layers.py:672-762) but are written as
pure JAX functions over ``(..., seq, head_dim)`` arrays so they vmap over
batch and head dims, jit cleanly, and shard over a device mesh.

The fused single-HBM-pass Pallas versions live in
``galerkin_transformer_tpu.ops.pallas`` behind the same signatures; these
jnp forms are the correctness oracle and the CPU/interpret fallback.

All matmuls request float32 accumulation (`preferred_element_type`) so the
kernels stay exact when activations are bfloat16 on TPU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def galerkin_attention(query: jax.Array, key: jax.Array, value: jax.Array,
                       softmax_qk: bool = False):
    """Softmax-free linear attention: ``out = Q @ (Kᵀ V / n)``.

    Reference semantics: libs/layers.py:708-734 (`linear_attention`), where
    the d×d score matrix is divided by the sequence length.  With
    ``softmax_qk=True`` this is the reference's 'linear'/'global' variant
    (softmax over Q rows, softmax over K columns first).

    Shapes: q, k, v: (..., n, d).  Returns (out, p_attn) with p_attn the
    (..., d, d) reduced score matrix, matching the reference's return pair.
    """
    n = query.shape[-2]
    if softmax_qk:
        query = jax.nn.softmax(query, axis=-1)
        key = jax.nn.softmax(key, axis=-2)
    scores = _dot(jnp.swapaxes(key, -2, -1), value) / n
    out = _dot(query, scores)
    return out, scores


def galerkin_attention_pos_blocked(query: jax.Array, key: jax.Array,
                                   value: jax.Array, pos: jax.Array,
                                   score_dropout=None):
    """Galerkin attention with positional concat, in block form.

    Mathematically identical to concatenating pos in front of q, k, v
    (reference layers.py:869-874) and running ``[p,q] @ ([p,k]ᵀ[p,v] / n)``,
    but the (n, d+p) concatenated operands are never materialized: the
    score matrix is assembled from four block matmuls on the raw arrays.
    On TPU this avoids three extra HBM round-trips AND the 97→128 lane
    padding the concatenated layout would pay (measured 1.45x fwd+bwd at
    n=8192, d=96 — docs/PERFORMANCE.md).

    q, k, v: (B, H, n, d) — k, v already normalized by the caller;
    pos: (B, n, p).  Returns (out (B, H, n, p+d), p_attn (B, H, p+d, p+d)).
    """
    n = query.shape[-2]
    b, h = query.shape[0], query.shape[1]
    p = pos.shape[-1]
    ph = jnp.broadcast_to(pos[:, None], (b, h, n, p)).astype(query.dtype)

    def mm(a, b_):
        return jnp.matmul(a, b_, preferred_element_type=jnp.float32
                          ).astype(query.dtype)

    pT = jnp.swapaxes(ph, -2, -1)
    kT = jnp.swapaxes(key, -2, -1)
    # S = [[pᵀp, pᵀv], [kᵀp, kᵀv]] / n   — (p+d) × (p+d), assembled tiny
    top = jnp.concatenate([mm(pT, ph), mm(pT, value)], axis=-1)
    bot = jnp.concatenate([mm(kT, ph), mm(kT, value)], axis=-1)
    p_attn = jnp.concatenate([top, bot], axis=-2) / n
    if score_dropout is not None:
        p_attn = score_dropout(p_attn)
    # out = [p, q] @ S without materializing [p, q]
    out = mm(ph, p_attn[..., :p, :]) + mm(query, p_attn[..., p:, :])
    return out, p_attn


def fourier_attention(query: jax.Array, key: jax.Array, value: jax.Array,
                      mask: Optional[jax.Array] = None):
    """Unnormalized quadratic attention: ``out = (Q Kᵀ / (√d · n)) V``.

    Reference: libs/layers.py:672-705 with attention_type in
    {'fourier','integral','local'} — scores are scaled by 1/√d_k and divided
    by seq_len instead of softmax; masked positions are zeroed.
    Note d is taken from the *final* feature dim (after any positional
    concatenation), as in the reference.
    """
    d_k = query.shape[-1]
    n = key.shape[-2]
    scores = _dot(query, jnp.swapaxes(key, -2, -1)) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask == 0, 0.0, scores)
    p_attn = scores / n
    out = _dot(p_attn, value)
    return out, p_attn


def softmax_attention(query: jax.Array, key: jax.Array, value: jax.Array,
                      mask: Optional[jax.Array] = None):
    """Classic scaled-dot-product softmax attention (libs/layers.py:687-697)."""
    d_k = query.shape[-1]
    scores = _dot(query, jnp.swapaxes(key, -2, -1)) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask == 0, -1e9, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    out = _dot(p_attn, value)
    return out, p_attn


def cosine_attention(query: jax.Array, key: jax.Array, value: jax.Array):
    """Cosine-similarity attention (libs/layers.py:682-684).

    The reference computes ``F.cosine_similarity(query, key.transpose(-2,-1))``
    which broadcasts to pairwise cosine similarity over the feature dim,
    scaled by 1/√d.
    """
    d_k = query.shape[-1]
    qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
    kn = key / (jnp.linalg.norm(key, axis=-1, keepdims=True) + 1e-8)
    p_attn = _dot(qn, jnp.swapaxes(kn, -2, -1)) / math.sqrt(d_k)
    out = _dot(p_attn, value)
    return out, p_attn


def causal_linear_attention(query: jax.Array, key: jax.Array, value: jax.Array,
                            kv_mask: Optional[jax.Array] = None,
                            eps: float = 1e-7):
    """Causal linear attention via prefix sums (libs/layers.py:736-762).

    Implemented with cumulative sums along the sequence axis — a scan XLA
    lowers to an efficient parallel prefix — instead of the reference's
    reshape-to-singleton-einsum formulation.

    q, k, v: (..., n, d).  Returns (out, p_attn) where p_attn is the
    (..., n, d, d) running outer-product state.
    """
    n = query.shape[-2]
    key = key / n
    if kv_mask is not None:
        m = kv_mask
        while m.ndim < key.ndim - 1:   # (B, n) -> (B, 1, …, n)
            m = m[..., None, :]
        m = m[..., None]               # broadcast over the feature dim
        key = jnp.where(m, key, 0.0)
        value = jnp.where(m, value, 0.0)

    # running dxd context: sum_{s<=t} k_s v_sᵀ
    kv = jnp.einsum("...nd,...ne->...nde", key, value,
                    preferred_element_type=jnp.float32)
    kv = jnp.cumsum(kv, axis=-3).astype(query.dtype)
    k_cum = jnp.cumsum(key, axis=-2)

    d_inv = 1.0 / (jnp.einsum("...nd,...nd->...n", k_cum + eps, query,
                              preferred_element_type=jnp.float32) + eps)
    out = jnp.einsum("...nd,...nde,...n->...ne", query, kv,
                     d_inv.astype(query.dtype),
                     preferred_element_type=jnp.float32).astype(query.dtype)
    return out, kv


def per_head_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                        eps: float = 1e-5):
    """LayerNorm over the head dim with per-head affine parameters.

    x: (..., H, n, d); scale, bias: (H, d).  Equivalent to the reference's
    ModuleList of per-head ``nn.LayerNorm(d_k)`` (libs/layers.py:915-951)
    but executed as one fused vector op.
    """
    xf = x.astype(jnp.float32)  # stats in f32 regardless of activation dtype
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xhat * scale[..., :, None, :] + bias[..., :, None, :]
    return out.astype(x.dtype)


def per_head_instance_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           eps: float = 1e-5):
    """InstanceNorm over the sequence dim with per-head, per-channel affine.

    Matches the reference's 'instance' norm_type: per head,
    ``nn.InstanceNorm1d(d_k, affine=True)`` applied to (B, d, n) — i.e.
    normalize each channel across the sequence (libs/layers.py:841-867,
    946-951).  x: (..., H, n, d); scale, bias: (H, d).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.var(xf, axis=-2, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xhat * scale[..., :, None, :] + bias[..., :, None, :]
    return out.astype(x.dtype)
