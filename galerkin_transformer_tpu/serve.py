"""Inference / serving layer.

`Predictor` wraps a trained model + params into a warm, jitted, batched
callable for production use: checkpoint loading, target-denormalization,
fixed-shape bucketing (one compiled executable per input resolution — the
operator is discretization-invariant, so serving at a new resolution is
just another bucket), and an optional device-mesh for batch-parallel
inference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    def __init__(self, model, params, normalizer: Optional[Tuple] = None,
                 mesh=None):
        self.model = model
        self.params = params
        self.normalizer = normalizer
        self.mesh = mesh
        self._compiled: Dict[Tuple, Any] = {}
        if mesh is not None:
            from .parallel import replicate
            self.params = jax.device_put(params, replicate(mesh))

    @classmethod
    def from_checkpoint(cls, model, checkpoint_path: str, example_batch: dict,
                        normalizer: Optional[Tuple] = None, mesh=None):
        from .train.checkpoint import load_checkpoint
        template = model.init(
            jax.random.key(0), jnp.asarray(example_batch["node"]), None,
            jnp.asarray(example_batch["pos"]),
            jnp.asarray(example_batch["grid"]))["params"]
        params = load_checkpoint(checkpoint_path, template)
        return cls(model, params, normalizer=normalizer, mesh=mesh)

    def _get_fn(self, shapes: Tuple):
        if shapes not in self._compiled:
            kwargs = {}
            try:  # models without a normalizer kwarg just ignore it
                import inspect
                if "normalizer" in inspect.signature(
                        self.model.__call__).parameters:
                    kwargs["normalizer"] = self.normalizer
            except (TypeError, ValueError):
                pass

            @jax.jit
            def fn(params, node, pos, grid):
                out = self.model.apply({"params": params}, node, None, pos,
                                       grid, deterministic=True, **kwargs)
                return out["preds"]
            self._compiled[shapes] = fn
        return self._compiled[shapes]

    def __call__(self, batch: dict) -> np.ndarray:
        node = jnp.asarray(batch["node"])
        pos = jnp.asarray(batch["pos"])
        grid = jnp.asarray(batch["grid"])
        if self.mesh is not None:
            from .parallel import batch_sharding, replicate
            node = jax.device_put(node, batch_sharding(self.mesh))
            pos = jax.device_put(pos, batch_sharding(self.mesh)
                                 if pos.shape[0] == node.shape[0]
                                 else replicate(self.mesh))
            grid = jax.device_put(grid, batch_sharding(self.mesh)
                                  if grid.shape[0] == node.shape[0]
                                  else replicate(self.mesh))
        fn = self._get_fn((node.shape, pos.shape, grid.shape))
        return np.asarray(fn(self.params, node, pos, grid))

    def warmup(self, batch: dict):
        _ = self(batch)
        return self
