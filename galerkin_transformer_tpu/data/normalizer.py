"""Per-location Gaussian normalizer (reference: libs/ft.py:373-415).

Pure numpy — stats are arrays that travel with the batch / model call, not
module state (the reference needed custom .to()/.cuda() overrides to move
them; here they are just data).
"""
from __future__ import annotations

import numpy as np


class UnitGaussianNormalizer:
    def __init__(self, eps: float = 1e-5):
        self.eps = eps
        self.mean: np.ndarray | None = None
        self.std: np.ndarray | None = None

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        self.mean = x.mean(axis=0)
        self.std = x.std(axis=0)
        return (x - self.mean) / (self.std + self.eps)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / (self.std + self.eps)

    def inverse_transform(self, x):
        return x * (self.std + self.eps) + self.mean

    def as_tuple(self, dtype=np.float32):
        """(mean, std, eps) triple for passing into a jitted model call."""
        return (np.asarray(self.mean, dtype), np.asarray(self.std, dtype),
                dtype(self.eps))
