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
    )
    return tx, sched


def adam_plateau(lr: float = 1e-3, grad_clip: float = 0.999,
                 patience: int = 10, factor: float = 0.5,
                 min_scale: float = 1e-4):
    """Adam + clip + ReduceLROnPlateau — the reference's per-epoch scheduler
    family (EPOCH_SCHEDULERS, utils_ft.py:744-745, 813-817).

    The returned transform consumes a ``value=`` kwarg at update time
    (pass the epoch/batch loss); train.steps factories forward it when
    built with ``needs_value=True``.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr),
        optax.contrib.reduce_on_plateau(
            patience=patience, factor=factor, min_scale=min_scale),
    )
    return tx, None
