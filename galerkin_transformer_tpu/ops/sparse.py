"""Device-side sparse edge utilities.

The Darcy FEM edge features (stiffness/Laplacian Krylov powers,
reference libs/ft.py:729-786) share one sparsity pattern across samples
and channels — it is determined by the fixed coarse triangulation, not by
the coefficient values.  The dataset can therefore ship them as
(indices (nse, 2), values (nse, C)) pairs (`DarcyDataset(sparse_edge=True)`,
reference ft.py:788-845 `csr_to_sparse`) and the dense (n², n², C) batch the
graph extractors consume is scattered *on device*: host→device transfer is
O(nse) instead of O(n⁴) — at a 61² coarse grid that is ~1000× less traffic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def densify_edges(indices: jax.Array, values: jax.Array, n: int) -> jax.Array:
    """Scatter sparse edges to dense adjacency maps.

    indices: (..., nse, 2) int32 row/col pairs (shared pattern per batch),
    values:  (..., nse, C) per-channel entries.
    Returns (..., n, n, C) dense, channels-last (the GCN/GAT input layout).
    """
    def one(idx, val):
        out = jnp.zeros((n, n, val.shape[-1]), val.dtype)
        return out.at[idx[:, 0], idx[:, 1]].set(val)

    if indices.ndim == 2:
        return one(indices, values)
    return jax.vmap(one)(indices, values)


def edges_to_bcoo(indices: jax.Array, values: jax.Array, n: int):
    """Per-channel list of BCOO (n, n) matrices from a shared pattern.

    For consumers that want true sparse aggregation
    (jax.experimental.sparse.bcoo_dot_general) instead of densifying.
    """
    from jax.experimental import sparse as jsparse

    return [jsparse.BCOO((values[..., c], indices), shape=(n, n))
            for c in range(values.shape[-1])]
