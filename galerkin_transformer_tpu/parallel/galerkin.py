"""Sequence-parallel Galerkin attention.

The Galerkin form ``out = Q (LN(K)ᵀ LN(V) / n)`` is embarrassingly
sequence-parallel: with the sequence dim sharded over a mesh axis, each
shard computes its local d×d partial reduction; one `psum` over the axis
yields the global score matrix, and the output rows stay shard-local.
Communication is O(d²) per head — independent of sequence length — versus
ring attention's O(n·d) per step for softmax attention.  (SURVEY §2.8,
§5 long-context plan.)

Both per-head LayerNorms are shard-local (they normalize over the feature
dim), so the full fused layer shards without any other collective.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import per_head_layer_norm


def seq_sharded_galerkin_attention(query: jax.Array, key: jax.Array,
                                   value: jax.Array,
                                   mesh: Mesh,
                                   scale_k=None, bias_k=None,
                                   scale_v=None, bias_v=None,
                                   pos: Optional[jax.Array] = None,
                                   eps: float = 1e-5,
                                   seq_axis: str = "seq",
                                   batch_axis: Optional[str] = "data",
                                   score_mask: Optional[jax.Array] = None):
    """Galerkin attention with the sequence dim sharded over `seq_axis`.

    query/key/value: (B, H, n, d); optional per-head LN params (H, d) are
    applied to K and V inside the shard (pre-matmul norm, reference
    layers.py:841-867); optional pos (B, n, p) is concatenated after LN.
    `score_mask` (B, H, d_eff, d_eff) — e.g. a dropout keep-mask — is
    multiplied into the psum'd score matrix (the reference applies dropout
    to p_attn, layers.py:723); computing the mask *outside* the shard_map
    keeps the RNG stream identical to the unsharded paths.

    Returns (out, p_attn): out (B, H, n, d[+p]) sharded like the inputs,
    p_attn (B, H, d_eff, d_eff) replicated over `seq_axis`.

    Token counts that don't divide the shard count (e.g. ex2's 71² = 5041
    coarse-grid tokens) are zero-padded to the next multiple; padded K
    rows are masked to zero AFTER the per-head LN + pos concat (LN of a
    zero row is the bias, which would otherwise pollute the d×d scores),
    so the psum'd score matrix is exact, and the padded output rows are
    sliced off.
    """
    n_shards = mesh.shape[seq_axis]
    n_global = key.shape[-2]
    pad = (-n_global) % n_shards
    token_mask = None
    if pad:
        def pad_seq(x, axis):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, pad)
            return jnp.pad(x, widths)
        query, key, value = (pad_seq(x, 2) for x in (query, key, value))
        if pos is not None:
            pos = pad_seq(pos, 1)
        token_mask = (jnp.arange(n_global + pad) < n_global).astype(
            key.dtype)

    bspec = batch_axis if batch_axis in mesh.axis_names else None
    qkv_spec = P(bspec, None, seq_axis, None)
    pos_spec = P(bspec, seq_axis, None)
    score_spec = P(bspec, None, None, None)

    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [query, key, value]
    if scale_k is not None:
        in_specs += [P(None, None)] * 4
        args += [scale_k, bias_k, scale_v, bias_v]
    if pos is not None:
        in_specs.append(pos_spec)
        args.append(pos)
    if score_mask is not None:
        in_specs.append(score_spec)
        args.append(score_mask)
    if token_mask is not None:
        in_specs.append(P(seq_axis))
        args.append(token_mask)

    def inner(q, k, v, *rest):
        rest = list(rest)
        tm = rest.pop() if token_mask is not None else None
        if scale_k is not None:
            sk, bk, sv, bv = rest[:4]
            rest = rest[4:]
            k = per_head_layer_norm(k, sk, bk, eps=eps)
            v = per_head_layer_norm(v, sv, bv, eps=eps)
        if pos is not None:
            p_loc = rest.pop(0)
            ph = jnp.broadcast_to(
                p_loc[:, None, :, :],
                (q.shape[0], q.shape[1], p_loc.shape[1], p_loc.shape[2]),
            ).astype(q.dtype)
            q = jnp.concatenate([ph, q], axis=-1)
            k = jnp.concatenate([ph, k], axis=-1)
            v = jnp.concatenate([ph, v], axis=-1)
        if tm is not None:
            # zero padded K rows (post-LN/pos): kills their score
            # contribution; kᵀv needs only one side masked
            k = k * tm[None, None, :, None]
        # local d×d partial reduction, then one psum over the seq axis
        partial_scores = jnp.matmul(jnp.swapaxes(k, -2, -1), v,
                                    preferred_element_type=jnp.float32)
        scores = jax.lax.psum(partial_scores, seq_axis) / n_global
        scores = scores.astype(q.dtype)
        if score_mask is not None:
            scores = scores * rest.pop(0).astype(q.dtype)
        out = jnp.matmul(q, scores,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return out, scores

    out, scores = jax.shard_map(inner, mesh=mesh,
                                in_specs=tuple(in_specs),
                                out_specs=(qkv_spec, score_spec))(*args)
    if pad:
        out = out[:, :, :n_global, :]
    return out, scores
