"""Explicit PRNG plumbing.

The reference framework uses a single global seed (1127802) pushed into
python/numpy/torch RNG state (reference: libs/utils.py:123-152,
libs/utils_ft.py:46).  In JAX randomness is explicit: `get_seed` seeds the
host-side numpy RNG (used by the data pipeline) and returns a `jax.random`
key for parameter init / dropout.
"""
from __future__ import annotations

import os
import random

import numpy as np

SEED = int(os.environ.get("SEED", 1127802))


def get_seed(seed: int = SEED, printout: bool = False, cudnn: bool = True):
    """Seed host RNGs and return a fresh JAX PRNG key.

    `cudnn` is accepted for signature parity with the reference
    (libs/utils.py:123); determinism on TPU comes from explicit keys, so it
    is a no-op here.
    """
    import jax

    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    if printout:
        print(f"seed = {seed} (host numpy/python seeded; JAX key returned)")
    return jax.random.key(seed)


def split_like(key, tree):
    """Split `key` into one key per leaf of `tree`, returned as a matching pytree."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
