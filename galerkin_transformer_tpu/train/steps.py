"""Jitted per-problem train/eval steps (reference: libs/utils_ft.py:593-711,
libs/ns_lite.py:205-264).

Each factory closes over (model, loss, optimizer) and returns

  train_step(params, opt_state, batch, rng) -> (params, opt_state, losses)
  eval_step(params, batch)                  -> metric

both fully jitted with donated params/opt_state.  The whole optimization
step — forward, Sobolev loss, backward, global-norm clip, Adam update,
1cycle LR — is one XLA program; there is no per-batch python in the hot
path.  The NS rollout trains through a `lax.scan` over the autoregressive
window (BPTT through all steps in one program, ns_lite.py:205-238).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _apply_kwargs(rng):
    return dict(deterministic=False, rngs={"dropout": rng})


def microbatched_value_and_grad(forward_loss, accum_steps: int):
    """Gradient accumulation: split the batch into ``accum_steps``
    microbatches and scan over them, averaging loss/aux/grads.

    For mean-reduced losses (all losses here) the result equals the
    full-batch gradient, but the live activation set is one microbatch —
    on TPU this keeps the working set small enough for XLA to pin the
    weights in VMEM across the scan instead of re-streaming them from
    HBM every step (the measured bsz-64 penalty, docs/PERFORMANCE.md
    "MFU vs model width").  Also the standard way to run effective batch
    sizes whose activations exceed HBM.

    ``forward_loss(params, batch, rng) -> (scalar, aux)``; batch leaves
    must have a leading batch dim divisible by ``accum_steps``.  Aux
    leaves are elementwise-averaged across microbatches, so aux must be
    microbatch-shape-invariant (scalars): a batch-shaped aux leaf would
    come back with microbatch shape and cross-microbatch averaging
    semantics.  The train steps here only consume scalar aux fields.
    """
    base = jax.value_and_grad(forward_loss, has_aux=True)
    if accum_steps <= 1:
        return base

    def wrapped(params, batch, rng):
        bad = [f"{k}: {v.shape}" for k, v in batch.items()
               if v is not None and v.shape[0] % accum_steps]
        if bad:  # trace-time check — free at runtime
            raise ValueError(
                f"gradient accumulation needs the leading batch dim "
                f"divisible by accum_steps={accum_steps}; got "
                f"{', '.join(bad)}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)
        keys = jax.random.split(rng, accum_steps)
        mb0 = jax.tree.map(lambda x: x[0], micro)
        shapes = jax.eval_shape(base, params, mb0, keys[0])
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        def body(carry, mb_key):
            mb, key = mb_key
            out = base(params, mb, key)
            return jax.tree.map(jnp.add, carry, out), None

        acc, _ = jax.lax.scan(body, zeros, (micro, keys))
        return jax.tree.map(lambda x: x / accum_steps, acc)

    return wrapped


# --------------------------------------------------------------- Burgers

def make_burgers_steps(model, loss_fn, metric_fn, tx,
                       donate: bool = True, needs_value: bool = False,
                       accum_steps: int = 1):
    def forward_loss(params, batch, rng):
        out = model.apply({"params": params}, batch["node"], batch["edge"],
                          batch["pos"], batch["grid"], **_apply_kwargs(rng))
        preds = out["preds"]
        target = batch["target"]
        u, up = target[..., 0], target[..., 1]
        latent = out["preds_latent"]
        if preds.shape[-1] == 2:
            res = loss_fn(preds[..., 0], u, preds[..., 1], up,
                          preds_latent=latent)
        else:
            res = loss_fn(preds[..., 0], u, targets_prime=up,
                          preds_latent=latent)
        total = res.loss + res.reg + res.ortho
        return total, res

    def train_step(params, opt_state, batch, rng):
        rng, sub = jax.random.split(rng)
        grad_fn = microbatched_value_and_grad(forward_loss, accum_steps)
        (_, res), grads = grad_fn(params, batch, sub)
        total = res.loss + res.reg + res.ortho
        extra = dict(value=total) if needs_value else {}
        updates, opt_state = tx.update(grads, opt_state, params, **extra)
        params = optax.apply_updates(params, updates)
        losses = (total, res.reg, res.ortho)
        return params, opt_state, rng, losses

    def eval_step(params, batch):
        out = model.apply({"params": params}, batch["node"], batch["edge"],
                          batch["pos"], batch["grid"], deterministic=True)
        u = batch["target"][..., 0]
        res = metric_fn(out["preds"][..., 0], u)
        return res.metric

    donate_args = (0, 1) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(eval_step))


# ----------------------------------------------------------------- Darcy

def make_darcy_steps(model, loss_fn, metric_fn, tx,
                     normalizer: Optional[Tuple] = None,
                     donate: bool = True, needs_value: bool = False,
                     online_noise: float = 0.0, accum_steps: int = 1):
    """``online_noise`` > 0 draws FRESH Gaussian measurement noise on the
    (normalized) train inputs every step — the reference bakes one fixed
    noise realization into the dataset (ft.py:567-568); resampling per
    epoch is equivalent-in-distribution data augmentation the static
    dataset can't express.  Validation inputs are untouched (the driver
    keeps the reference's fixed-noise valid set)."""
    def forward(params, batch, rng=None, node=None):
        kwargs = _apply_kwargs(rng) if rng is not None else dict(
            deterministic=True)
        out = model.apply({"params": params},
                          batch["node"] if node is None else node,
                          batch["edge"], batch["pos"], batch["grid"],
                          normalizer=normalizer, **kwargs)
        return out

    def forward_loss(params, batch, rng):
        node = None
        if online_noise > 0:
            rng, nkey = jax.random.split(rng)
            node = batch["node"] + online_noise * jax.random.normal(
                nkey, batch["node"].shape, batch["node"].dtype)
        out = forward(params, batch, rng, node=node)
        preds = out["preds"]  # (B, n, n, n_targets)
        u = batch["target"][..., 0]
        gradu = batch["target_grad"]
        a = batch["coeff"]
        res = loss_fn(preds[..., 0], u, preds[..., 1:], gradu, K=a)
        return res.loss + res.reg, res

    def train_step(params, opt_state, batch, rng):
        rng, sub = jax.random.split(rng)
        grad_fn = microbatched_value_and_grad(forward_loss, accum_steps)
        (_, res), grads = grad_fn(params, batch, sub)
        extra = dict(value=res.loss + res.reg) if needs_value else {}
        updates, opt_state = tx.update(grads, opt_state, params, **extra)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, (res.loss + res.reg, res.reg)

    def eval_step(params, batch):
        out = forward(params, batch)
        u = batch["target"][..., 0]
        res = metric_fn(out["preds"][..., 0], u)
        return res.metric

    donate_args = (0, 1) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(eval_step))


# ------------------------------------------------------------------- NS

def make_ns_steps(model, loss_fn, metric_fn, tx, time_steps: int = 10,
                  donate: bool = True, needs_value: bool = False,
                  accum_steps: int = 1):
    """Autoregressive rollout training: scan over the window, one backward
    through all steps (ns_lite.py:205-238)."""

    def rollout_loss(params, batch, rng):
        x0 = batch["node"]             # (B, n, n, T_in)
        pos, grid = batch["pos"], batch["grid"]
        u, gradu = batch["target"], batch["target_grad"]
        keys = jax.random.split(rng, time_steps)

        def body(x, inp):
            t, key = inp
            out = model.apply({"params": params}, x, None, pos, grid,
                              **_apply_kwargs(key))
            u_pred = out["preds"]      # (B, n, n, 1)
            u_t = jax.lax.dynamic_index_in_dim(u, t, axis=-1)          # (B,n,n,1)
            gradu_t = jax.lax.dynamic_index_in_dim(gradu, t, axis=-1)  # (B,n,n,2,1)
            res = loss_fn(u_pred[..., 0], u_t[..., 0],
                          targets_prime=gradu_t[..., 0])
            x = jnp.concatenate([x[..., 1:], u_pred], axis=-1)
            return x, (res.loss + res.reg, res.reg)

        _, (losses, regs) = jax.lax.scan(
            body, x0, (jnp.arange(time_steps), keys))
        return jnp.sum(losses), (jnp.sum(losses), jnp.sum(regs))

    def train_step(params, opt_state, batch, rng):
        rng, sub = jax.random.split(rng)
        grad_fn = microbatched_value_and_grad(rollout_loss, accum_steps)
        (_, (loss_tot, reg_tot)), grads = grad_fn(params, batch, sub)
        extra = dict(value=loss_tot) if needs_value else {}
        updates, opt_state = tx.update(grads, opt_state, params, **extra)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, (loss_tot / time_steps,
                                        reg_tot / time_steps)

    def eval_step(params, batch):
        x0 = batch["node"]
        pos, grid = batch["pos"], batch["grid"]
        u = batch["target"]

        def body(x, t):
            out = model.apply({"params": params}, x, None, pos, grid,
                              deterministic=True)
            u_pred = out["preds"]
            u_t = jax.lax.dynamic_index_in_dim(u, t, axis=-1)
            res = metric_fn(u_pred[..., 0], u_t[..., 0])
            x = jnp.concatenate([x[..., 1:], u_pred], axis=-1)
            return x, res.metric

        _, metrics = jax.lax.scan(body, x0, jnp.arange(time_steps))
        return jnp.mean(metrics)

    donate_args = (0, 1) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(eval_step))
