"""Sobolev-norm training losses (reference: libs/ft.py:848-1105).

Relative weighted L2 plus optional H¹-seminorm regularizer and (1D)
orthogonality penalty on encoder latents.  Implemented as callable
dataclasses over jnp arrays — everything returned is a traced scalar, so
the whole loss sits inside the jitted train step (the reference calls
``.item()`` mid-loss; here metrics come back as arrays).

Tuple-order parity with the reference is preserved via NamedTuples:
  1D returns (loss, reg, ortho, metric)           — ft.py:980
  2D returns (loss, reg, metric, norms)           — ft.py:1105
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class LossResult1d(NamedTuple):
    loss: jax.Array
    reg: jax.Array
    ortho: jax.Array
    metric: jax.Array


class LossResult2d(NamedTuple):
    loss: jax.Array
    reg: jax.Array
    metric: jax.Array
    norms: dict


def _metric(loss: jax.Array, reduction: str) -> jax.Array:
    if reduction == "L2":
        return jnp.sqrt(jnp.mean(loss))
    if reduction == "L1":  # Li et al: first norm, then average
        return jnp.mean(jnp.sqrt(loss))
    if reduction == "Linf":
        return jnp.max(jnp.sqrt(loss))
    raise ValueError(f"unknown metric reduction {reduction!r}")


@dataclasses.dataclass(frozen=True)
class WeightedL2Loss:
    """1D relative L2 + H¹ regularizer + orthogonalizer (ft.py:848-980)."""
    dilation: int = 2
    regularizer: bool = False
    h: float = 1 / 512
    beta: float = 1.0
    gamma: float = 1e-1   # H¹ (scaled by h at call sites like the reference init)
    alpha: float = 0.0
    delta: float = 1e-4
    metric_reduction: str = "L1"
    periodic: bool = False
    return_norm: bool = True
    orthogonal_reg: bool = False
    orthogonal_mode: str = "global"
    noise: float = 0.0

    def central_diff(self, x: jax.Array, h: Optional[float] = None) -> jax.Array:
        h = self.h if h is None else h
        d = self.dilation
        return (x[:, d:] - x[:, :-d]) / d / h

    def __call__(self, preds, targets, preds_prime=None, targets_prime=None,
                 preds_latent: Sequence = (), K=None,
                 noise_rng: Optional[jax.Array] = None) -> LossResult1d:
        assert self.dilation % 2 == 0
        h = self.h
        gamma = self.gamma * h
        alpha = self.alpha * h
        delta = self.delta * h

        if self.noise > 0 and noise_rng is not None:
            targets = jax.lax.stop_gradient(
                targets * (1.0 + self.noise
                           * jax.random.uniform(noise_rng, targets.shape)))

        target_norm = h * jnp.sum(targets ** 2, axis=1)
        if targets_prime is not None:
            targets_prime_norm = h * jnp.sum(targets_prime ** 2, axis=1)
        else:
            targets_prime_norm = 1.0

        loss = self.beta * (h * jnp.sum((preds - targets) ** 2, axis=1)
                            ) / target_norm
        if preds_prime is not None and alpha > 0:
            k = 1.0 if K is None else K
            grad_diff = h * (preds_prime - k * targets_prime) ** 2
            loss = loss + alpha * jnp.sum(grad_diff, axis=1) / targets_prime_norm

        metric = _metric(loss, self.metric_reduction)
        loss_out = (jnp.mean(jnp.sqrt(loss)) if self.return_norm
                    else jnp.mean(loss))

        if self.regularizer and gamma > 0 and targets_prime is not None:
            preds_diff = self.central_diff(preds)
            s = self.dilation // 2
            reg = gamma * h * jnp.sum(
                (targets_prime[:, s:-s] - preds_diff) ** 2, axis=1
            ) / targets_prime_norm
            reg_out = (jnp.mean(jnp.sqrt(reg)) if self.return_norm
                       else jnp.mean(reg))
        else:
            reg_out = jnp.zeros(())

        if self.orthogonal_reg and len(preds_latent) > 0:
            ortho = []
            for y in preds_latent:
                if self.orthogonal_mode in ("local", "fourier"):
                    mm = jnp.matmul(y, jnp.swapaxes(y, -2, -1),
                                    preferred_element_type=jnp.float32)
                    tr = jnp.sum(y ** 2, axis=-1)
                else:  # global / galerkin / linear
                    mm = jnp.matmul(jnp.swapaxes(y, -2, -1), y,
                                    preferred_element_type=jnp.float32)
                    tr = jnp.sum(y ** 2, axis=-2)
                diag = jax.lax.stop_gradient(jax.vmap(jnp.diag)(tr))
                ortho.append(delta * jnp.mean((mm - diag) ** 2, axis=(-1, -2)))
            ortho = jnp.stack(ortho, axis=-1)
            ortho_out = (jnp.mean(jnp.sqrt(ortho)) if self.return_norm
                         else jnp.mean(ortho))
        else:
            ortho_out = jnp.zeros(())

        return LossResult1d(loss_out, reg_out, ortho_out, metric)


@dataclasses.dataclass(frozen=True)
class WeightedL2Loss2d:
    """2D relative L2 + coefficient-weighted H¹ regularizer (ft.py:983-1105)."""
    dim: int = 2
    dilation: int = 2
    regularizer: bool = False
    h: float = 1 / 421
    beta: float = 1.0
    gamma: float = 1e-1
    alpha: float = 0.0
    delta: float = 0.0
    metric_reduction: str = "L1"
    return_norm: bool = True
    noise: float = 0.0
    eps: float = 1e-10

    def central_diff(self, u: jax.Array, h: Optional[float] = None) -> jax.Array:
        """(B, n, n) -> (B, n-2, n-2, 2)."""
        h = self.h if h is None else h
        d = self.dilation
        s = d // 2
        grad_x = (u[:, d:, s:-s] - u[:, :-d, s:-s]) / d
        grad_y = (u[:, s:-s, d:] - u[:, s:-s, :-d]) / d
        return jnp.stack([grad_x, grad_y], axis=-1) / h

    def __call__(self, preds, targets, preds_prime=None, targets_prime=None,
                 weights=None, K=None,
                 noise_rng: Optional[jax.Array] = None) -> LossResult2d:
        assert self.dilation % 2 == 0
        h = self.h if weights is None else weights
        d = self.dim
        k = jnp.asarray(1.0) if K is None else K

        if self.noise > 0 and noise_rng is not None:
            targets = jax.lax.stop_gradient(
                targets * (1.0 + self.noise
                           * jax.random.uniform(noise_rng, targets.shape)))

        target_norm = jnp.mean(targets ** 2, axis=(1, 2)) + self.eps
        if targets_prime is not None:
            targets_prime_norm = d * jnp.mean(
                (k * targets_prime ** 2), axis=(1, 2, 3)) + self.eps
        else:
            targets_prime_norm = 1.0

        loss = self.beta * jnp.mean((preds - targets) ** 2,
                                    axis=(1, 2)) / target_norm
        if preds_prime is not None and self.alpha > 0:
            grad_diff = (k * (preds_prime - targets_prime)) ** 2
            loss = loss + self.alpha * jnp.mean(
                grad_diff, axis=(1, 2, 3)) / targets_prime_norm

        metric = _metric(loss, self.metric_reduction)
        loss_out = (jnp.mean(jnp.sqrt(loss)) if self.return_norm
                    else jnp.mean(loss))

        if self.regularizer and targets_prime is not None:
            preds_diff = self.central_diff(preds)
            s = self.dilation // 2
            tp = targets_prime[:, s:-s, s:-s, :]
            kk = k[:, s:-s, s:-s] if k.ndim > 1 else k
            reg = self.gamma * h * jnp.mean(
                (kk * (tp - preds_diff)) ** 2, axis=(1, 2, 3)
            ) / targets_prime_norm
            reg_out = (jnp.mean(jnp.sqrt(reg)) if self.return_norm
                       else jnp.mean(reg))
        else:
            reg_out = jnp.zeros(())

        norms = dict(L2=target_norm, H1=targets_prime_norm)
        return LossResult2d(loss_out, reg_out, metric, norms)
