"""LR schedules.

The reference trains everything with torch OneCycleLR stepping per batch
(max_lr, div_factor=1e4, final_div_factor=1e4, pct_start 0.2/0.3, cosine
anneal — examples/ex1_burgers.py:79-82).  optax's cosine_onecycle_schedule
implements the same curve; this wrapper pins the reference's defaults.
"""
from __future__ import annotations

import optax


def onecycle_schedule(max_lr: float, total_steps: int,
                      pct_start: float = 0.2,
                      div_factor: float = 1e4,
                      final_div_factor: float = 1e4):
    # optax's piecewise boundaries degenerate (NaN lr) when the warmup
    # phase rounds to zero steps; clamp so tiny smoke runs stay finite
    total_steps = max(int(total_steps), 2)
    pct_start = max(pct_start, 1.0 / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def adam_onecycle(max_lr: float, total_steps: int,
                  pct_start: float = 0.2,
                  div_factor: float = 1e4,
                  final_div_factor: float = 1e4,
                  grad_clip: float = 0.999,
                  weight_decay: float = 0.0):
    """Adam + global-norm clip + 1cycle — the reference recipe in one chain.

    Gradient clipping threshold matches train_batch_* (0.999 for Burgers,
    0.99 for Darcy/NS — pass grad_clip accordingly).
    """
    sched = onecycle_schedule(max_lr, total_steps, pct_start,
                              div_factor, final_div_factor)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay)
        if weight_decay > 0 else optax.adam(sched),
        # host-controllable global lr scale (1.0 = no-op): the trainer's
        # spike-rollback recovery halves it per rollback, because
        # restarting from the best checkpoint at the SAME lr that caused
        # the explosion deterministically re-explodes (field test:
        # docs/PERFORMANCE.md 500-ep stability note)
        optax.inject_hyperparams(optax.scale)(step_size=1.0),
    )
    return tx, sched


class PlateauController:
    """Host-side ReduceLROnPlateau stepped ONCE PER EPOCH on the epoch
    validation metric — matching the reference's EPOCH_SCHEDULERS
    semantics (utils_ft.py:744-745, 813-817: ``scheduler.step(metric)``
    after ``validate_epoch``), with torch's defaults (mode='min',
    rel threshold 1e-4, patience counted in epochs).

    The optimizer's lr lives in the optax state via
    ``optax.inject_hyperparams``; :meth:`step` rewrites that leaf when a
    reduction triggers, so the jitted train step needs no ``value=``
    side-channel and the patience clock ticks per epoch, not per batch.
    """

    def __init__(self, init_lr: float, factor: float = 0.5,
                 patience: int = 10, threshold: float = 1e-4,
                 min_lr: float = 0.0, mode: str = "min",
                 verbose: bool = True):
        self.lr = float(init_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.mode = mode
        self.verbose = verbose
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, opt_state, metric: float):
        """Consume one epoch's validation metric; return (possibly
        lr-rewritten) opt_state."""
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if new_lr < self.lr:
                self.lr = new_lr
                opt_state = _set_injected_lr(opt_state, new_lr)
                if self.verbose:
                    print(f"ReduceLROnPlateau: lr -> {new_lr:.3e}",
                          flush=True)
            self.num_bad_epochs = 0
        return opt_state


def _set_injected_lr(opt_state, lr: float):
    """Rewrite the learning_rate hyperparam leaf inside an optax state
    tree containing an InjectHyperparamsState (chain-position agnostic)."""
    import jax.numpy as jnp

    found = []

    def rewrite(state):
        if hasattr(state, "hyperparams") and \
                "learning_rate" in getattr(state, "hyperparams", {}):
            found.append(True)
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
            return state._replace(hyperparams=hp)
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            return tuple(rewrite(s) for s in state)
        return state

    new_state = rewrite(opt_state)
    if not found:
        raise ValueError("opt_state contains no InjectHyperparamsState "
                         "with a learning_rate — build it via "
                         "adam_plateau()")
    return new_state


def adam_plateau(lr: float = 1e-3, grad_clip: float = 0.999,
                 patience: int = 10, factor: float = 0.5,
                 min_lr: float = 0.0):
    """Adam + clip with a per-EPOCH ReduceLROnPlateau controller — the
    reference's per-epoch scheduler family (EPOCH_SCHEDULERS,
    utils_ft.py:744-745, 813-817).

    Returns ``(tx, controller)``.  Pass ``plateau=controller`` to
    ``run_train``: after each epoch's validation it calls
    ``controller.step(opt_state, val_metric)``, which matches torch's
    ``scheduler.step(metric)`` placement exactly (patience in epochs, on
    the validation metric — NOT per optimizer step on the train loss).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr),
    )
    return tx, PlateauController(lr, factor=factor, patience=patience,
                                 min_lr=min_lr)
