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


def onecycle_momentum_schedule(total_steps: int,
                               pct_start: float = 0.2,
                               base_momentum: float = 0.85,
                               max_momentum: float = 0.95):
    """torch OneCycleLR's ``cycle_momentum`` companion curve.

    With Adam, torch's OneCycleLR (cycle_momentum=True — the DEFAULT, and
    every reference driver leaves it on) rewrites beta1 each step: cosine
    from max_momentum down to base_momentum over the warmup phase and back
    up over the anneal phase — the inverse of the lr curve.  The reference
    therefore never trains with Adam's nominal beta1=0.9; it runs
    0.95→0.85→0.95.  Phase boundaries follow optax's cosine_onecycle
    convention (peak at pct_start·total), matching `onecycle_schedule` so
    lr and beta1 stay in lockstep.
    """
    import jax.numpy as jnp

    total_steps = max(int(total_steps), 2)
    pct_start = max(pct_start, 1.0 / total_steps)
    warm = pct_start * total_steps

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        down = 0.5 * (1 - jnp.cos(jnp.pi * jnp.clip(count / warm, 0.0, 1.0)))
        up = 0.5 * (1 - jnp.cos(jnp.pi * jnp.clip(
            (count - warm) / (total_steps - warm), 0.0, 1.0)))
        return jnp.where(
            count <= warm,
            max_momentum + (base_momentum - max_momentum) * down,
            base_momentum + (max_momentum - base_momentum) * up)

    return schedule


def scale_by_adam_cycled(b1_schedule, b2: float = 0.999, eps: float = 1e-8):
    """Adam moment scaling with a per-step SCHEDULED beta1.

    optax.scale_by_adam takes b1 as a constant; torch's OneCycleLR rewrites
    the optimizer's beta1 every step (see onecycle_momentum_schedule).  This
    transform applies the current b1(count) to the first-moment EMA and to
    its bias correction — exactly what torch Adam does when the scheduler
    rewrites ``betas`` (torch recomputes bias_correction1 = 1 - beta1**step
    with the CURRENT beta1).  State is a plain optax.ScaleByAdamState so the
    trainer's rollback moment-reset keeps working unchanged.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=zeros(params), nu=zeros(params))

    def update(updates, state, params=None):
        del params
        b1 = b1_schedule(state.count)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, updates)
        count = state.count + 1
        c1 = 1 - b1 ** count
        c2 = 1 - b2 ** count
        out = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def adam_onecycle(max_lr: float, total_steps: int,
                  pct_start: float = 0.2,
                  div_factor: float = 1e4,
                  final_div_factor: float = 1e4,
                  grad_clip: float = 0.999,
                  weight_decay: float = 0.0,
                  cycle_momentum: bool = True,
                  base_momentum: float = 0.85,
                  max_momentum: float = 0.95):
    """Adam + global-norm clip + 1cycle — the reference recipe in one chain.

    Gradient clipping threshold matches train_batch_* (0.999 for Burgers,
    0.99 for Darcy/NS — pass grad_clip accordingly).  cycle_momentum=True
    (default) additionally cycles Adam's beta1 0.95→0.85→0.95 inversely to
    the lr, replicating torch OneCycleLR's default the reference trains
    under in every driver (a recipe disparity found in round 3: we
    previously held beta1=0.9 throughout).
    """
    sched = onecycle_schedule(max_lr, total_steps, pct_start,
                              div_factor, final_div_factor)
    if cycle_momentum:
        b1 = onecycle_momentum_schedule(total_steps, pct_start,
                                        base_momentum, max_momentum)
        adam = optax.chain(
            scale_by_adam_cycled(b1),
            optax.add_decayed_weights(weight_decay)
            if weight_decay > 0 else optax.identity(),
            optax.scale_by_learning_rate(sched),
        )
    else:
        adam = (optax.adamw(sched, weight_decay=weight_decay)
                if weight_decay > 0 else optax.adam(sched))
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        adam,
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
