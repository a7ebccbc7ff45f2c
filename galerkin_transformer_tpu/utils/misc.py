"""Small generic helpers (reference: libs/utils.py:258-302, libs/layers.py:14-18)."""
from __future__ import annotations


def default(value, d):
    """None-coalescing helper (reference: libs/layers.py:14-18)."""
    return d if value is None else value


def get_num_params(params) -> int:
    """Total parameter count of a pytree.

    Complex leaves count double, matching the reference convention
    (libs/utils.py:258-268 counts complex parameters twice).
    """
    import jax
    import jax.numpy as jnp

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        n = leaf.size
        if jnp.iscomplexobj(leaf):
            n *= 2
        total += n
    return int(total)
