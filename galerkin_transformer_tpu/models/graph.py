"""Graph feature extractors (reference: libs/layers.py:153-281, model.py:376-469).

Edge features arrive channels-last (B, n, n, E); the per-channel GCN
aggregation is one einsum instead of the reference's broadcast-matmul with
singleton reshape.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv2dResBlock


class GraphConvolution(nn.Module):
    """Batched multi-edge-channel GCN layer (layers.py:153-198).

    x: (B, n, in_features); edge: (B, C, n, n) with C == out_features —
    each output channel is aggregated with its own (learned) edge matrix:
    out[b, :, c] = edge[b, c] @ (x W)[b, :, c].
    """
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, edge):
        stdv = 1.0 / math.sqrt(self.out_features)
        uniform = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -stdv, stdv)
        w = self.param("weight", uniform, (self.in_features, self.out_features))
        support = jnp.einsum("bni,io->bno", x, w.astype(x.dtype),
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.einsum("bcnm,bmc->bnc", edge, support,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", uniform, (self.out_features,))
            out = out + b.astype(out.dtype)
        return out


class GraphAttention(nn.Module):
    """Batched GAT layer masked by graph-Laplacian magnitude (layers.py:201-257)."""
    in_features: int
    out_features: int
    alpha: float = 1e-2
    concat: bool = True
    graph_lap: bool = True
    interaction_thresh: float = 1e-6
    dropout: float = 0.1

    @nn.compact
    def __call__(self, node, adj, deterministic: bool = True):
        gain = math.sqrt(2.0)
        xavier = nn.initializers.xavier_normal()

        def scaled(key, shape, dtype=jnp.float32):
            return xavier(key, shape, dtype) * gain

        w = self.param("W", scaled, (self.in_features, self.out_features))
        a = self.param("a", scaled, (2 * self.out_features, 1))

        h = jnp.einsum("bni,io->bno", node, w.astype(node.dtype),
                       preferred_element_type=jnp.float32).astype(node.dtype)
        # e_ij = leakyrelu(aᵀ [h_i ; h_j]) — computed without materializing
        # the n²×2F pair tensor: split a into its h_i and h_j halves.
        a1 = a[: self.out_features, 0].astype(h.dtype)
        a2 = a[self.out_features:, 0].astype(h.dtype)
        e = (h @ a1)[:, :, None] + (h @ a2)[:, None, :]
        e = jax.nn.leaky_relu(e, negative_slope=self.alpha)

        if self.graph_lap:
            connect = jnp.abs(adj) > self.interaction_thresh
        else:
            connect = adj > 0
        e = jnp.where(connect, e, -9e15)
        attn = jax.nn.softmax(e, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        h_prime = jnp.einsum("bnm,bmo->bno", attn, h,
                             preferred_element_type=jnp.float32).astype(h.dtype)
        return jax.nn.elu(h_prime) if self.concat else h_prime


class EdgeEncoder(nn.Module):
    """Learn edge features from raw Laplacians via 2 conv res blocks
    (layers.py:260-281).  Input/output channels-last: (B, n, n, E)."""
    out_dim: int
    edge_feats: int
    raw_laplacian: Optional[bool] = None

    @nn.compact
    def __call__(self, lap, deterministic: bool = True):
        assert self.out_dim > self.edge_feats
        out_dim = self.out_dim
        if self.raw_laplacian:
            out_dim = out_dim - self.edge_feats
        d0 = int(out_dim / 3 * 2)
        d1 = out_dim - d0
        edge1 = Conv2dResBlock(d0, name="lap_conv1")(lap, deterministic)
        edge2 = Conv2dResBlock(d1, name="lap_conv2")(edge1, deterministic)
        if self.raw_laplacian:
            return jnp.concatenate([lap, edge1, edge2], axis=-1)
        return jnp.concatenate([edge1, edge2], axis=-1)


class GCN(nn.Module):
    """EdgeEncoder + GraphConvolution stack (model.py:376-427)."""
    node_feats: int = 4
    out_features: int = 96
    num_gcn_layers: int = 2
    edge_feats: int = 6
    activation: bool = True
    raw_laplacian: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, edge, deterministic: bool = True):
        # edge arrives (B, n, n, E) channels-last
        assert edge.shape[-1] == self.edge_feats
        edge = EdgeEncoder(self.out_features, self.edge_feats,
                           self.raw_laplacian, name="edge_learner")(
                               edge, deterministic)
        edge = edge.transpose(0, 3, 1, 2)  # (B, C, n, n) for per-channel agg
        out = GraphConvolution(self.node_feats, self.out_features,
                               name="gcn_layer0")(x, edge)
        # middle layers get ReLU; the last layer has no activation
        for i in range(1, self.num_gcn_layers):
            out = GraphConvolution(self.out_features, self.out_features,
                                   name=f"gcn_layer{i}")(out, edge)
            if self.activation and i < self.num_gcn_layers - 1:
                out = jax.nn.relu(out)
        return out


class GAT(nn.Module):
    """GraphAttention stack on the first edge channel (model.py:430-469)."""
    node_feats: int = 4
    out_features: int = 96
    num_gcn_layers: int = 2
    activation: bool = False

    @nn.compact
    def __call__(self, x, edge, deterministic: bool = True):
        adj = edge[..., 0]  # (B, n, n): first channel is the graph Laplacian
        out = GraphAttention(self.node_feats, self.out_features,
                             name="gat_layer0")(x, adj, deterministic)
        for i in range(1, self.num_gcn_layers):
            out = GraphAttention(self.out_features, self.out_features,
                                 name=f"gat_layer{i}")(out, adj, deterministic)
            if self.activation and i < self.num_gcn_layers - 1:
                out = jax.nn.relu(out)
        return out
