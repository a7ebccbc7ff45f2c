"""Training loop (reference: libs/utils_ft.py:714-861).

`run_train` keeps the reference's contract — epoch loop, per-batch LR
schedule (baked into the optax chain), best-val checkpointing, early
stopping with patience, loss/lr history in a result dict pickled every
epoch — around jitted steps produced by `train.steps` factories.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Optional

import jax
import numpy as np

from .checkpoint import save_checkpoint, save_pickle


@dataclasses.dataclass
class TrainResult:
    best_val_epoch: int
    best_val_metric: float
    loss_train: np.ndarray
    loss_val: np.ndarray
    lr_history: np.ndarray
    best_params: Any = None

    def asdict(self):
        return dict(best_val_epoch=self.best_val_epoch,
                    best_val_metric=self.best_val_metric,
                    loss_train=self.loss_train,
                    loss_val=self.loss_val,
                    lr_history=self.lr_history)


def validate_epoch(eval_step: Callable, params, valid_loader) -> float:
    # dispatch all batches asynchronously, fetch once: on a remote-execution
    # backend every float() is a full round-trip (~10-100 ms), which would
    # dominate the actual compute
    metrics = [eval_step(params, batch) for batch in valid_loader]
    return float(np.mean(jax.device_get(metrics)))


def _scale_injected_step(opt_state, factor: float):
    """Multiply the injected ``step_size`` hyperparam (the trainer-
    controllable global lr scale appended by `adam_onecycle`) by
    ``factor``.  Returns (new_state, new_scale) — (state, None) untouched
    if the chain has no injected step_size (older/custom optimizers)."""
    import jax.numpy as jnp

    found = []

    def rewrite(state):
        if hasattr(state, "hyperparams") and \
                "step_size" in getattr(state, "hyperparams", {}):
            hp = dict(state.hyperparams)
            new = jnp.asarray(hp["step_size"]) * factor
            found.append(float(new))
            hp["step_size"] = new
            return state._replace(hyperparams=hp)
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            return tuple(rewrite(s) for s in state)
        return state

    new_state = rewrite(opt_state)
    if not found:
        return opt_state, None
    return new_state, found[0]


def _reset_adam_moments(opt_state):
    """Zero the first/second-moment trees of every ScaleByAdamState-like
    node in an optax state tree, preserving everything else (step counts,
    injected hyperparams) — so a post-rollback optimizer forgets the
    exploded gradient statistics but keeps its schedule position."""
    import jax.numpy as jnp

    def rewrite(state):
        if hasattr(state, "mu") and hasattr(state, "nu") and \
                hasattr(state, "_replace"):
            zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
            return state._replace(mu=zeros(state.mu), nu=zeros(state.nu))
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            return tuple(rewrite(s) for s in state)
        return state

    return rewrite(opt_state)


def run_train(train_step: Callable,
              eval_step: Callable,
              params,
              opt_state,
              train_loader,
              valid_loader,
              rng,
              epochs: int = 10,
              lr_schedule: Optional[Callable] = None,
              plateau=None,
              patience: Optional[int] = 10,
              mode: str = "min",
              start_epoch: int = 0,
              resume: bool = False,
              model_save_path: str = "models_ckpt",
              model_name: str = "model.ckpt",
              result_name: str = "result.pkl",
              save_best: bool = True,
              async_checkpoint: bool = False,
              ema_decay: Optional[float] = None,
              device_loop: bool = False,
              epochs_per_dispatch: int = 1,
              rollback_on_spike: Optional[float] = None,
              max_rollbacks: int = 5,
              verbose: bool = True) -> tuple:
    """Returns (best_params, final_params, opt_state, TrainResult).

    With ``resume=True`` the params AND optimizer state are restored from
    the checkpoint before training continues at `start_epoch` — unlike the
    reference, which saved optimizer state but never reloaded it
    (utils_ft.py:858).

    With ``async_checkpoint=True`` best-val checkpoints go through the
    orbax AsyncCheckpointer (background IO, multi-host safe) instead of
    the synchronous msgpack file.

    With ``ema_decay`` set (e.g. 0.999), an exponential moving average of
    the parameters is tracked on-device each step and used for validation
    and best-checkpoint selection (the raw params keep training).

    With ``device_loop=True`` the datasets are uploaded to HBM once and
    each epoch (shuffle + every train step + validation) runs as ONE
    jitted program (`train.device_loop.DeviceEpochRunner`) — on a
    remote-execution backend this removes ~n_batches×(10-100 ms) of
    per-batch upload latency per epoch.  Single-process only.

    With ``epochs_per_dispatch=k > 1`` (device_loop only) k epochs run
    as one program with ON-DEVICE best-val/best-param tracking, cutting
    the remaining per-epoch dispatch + fetch round trip to one per k
    epochs.  Exact best-epoch checkpoint semantics are preserved (the
    best tree is selected inside the scan); the trade-offs are
    block-granular checkpoint IO / early-stop reaction (up to k-1 extra
    epochs of compute after the stop condition) and, with EMA, the
    checkpointed raw trajectory being the block-final raw params.
    Incompatible with the plateau scheduler (per-epoch host lr control).

    With ``rollback_on_spike=s`` (e.g. 10.0), an epoch whose mean train
    loss exceeds s× the best epoch loss so far — or goes non-finite —
    triggers failure recovery instead of training on from the wreck:
    params (and the EMA tree) are restored from the best checkpoint and
    the Adam moment estimates are zeroed (the schedule step count is
    kept).  At most ``max_rollbacks`` recoveries; after that, stop with
    the best checkpoint preserved.
    """
    if patience is None or patience == 0:
        patience = epochs
    best_val = -np.inf if mode == "max" else np.inf
    best_epoch = start_epoch
    # DEVICE-side copy: train_step donates param buffers, so the snapshot
    # must not alias them — but it must also stay on device: a host copy
    # is one tunnel round-trip PER LEAF (~100 leaves × 10-100 ms swamped
    # the 0.2 s device epoch in round 2)
    import jax.numpy as jnp
    _snapshot = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), tree)
    best_params = _snapshot(params)
    stop_counter = 0
    loss_train, loss_val, lr_history = [], [], []
    it = start_epoch * len(train_loader)

    # failure recovery: a loss explosion at high lr can drop the model
    # into a dead zero-gradient basin it never leaves (observed on 500-ep
    # runs: one bad epoch at lr 1e-3 -> frozen trivial predictor for the
    # remaining 400 epochs).  With rollback_on_spike=s, an epoch whose
    # train loss exceeds s x the best epoch loss (or goes non-finite)
    # restores the best checkpoint and zeroes the Adam moments (schedule
    # position kept), instead of training on from the wreck.
    n_rollbacks = 0
    best_train_loss = np.inf

    def _spiked(loss_mean):
        loss0 = float(loss_mean[0])
        finite = bool(np.isfinite(loss_mean).all())
        return rollback_on_spike is not None and (
            not finite or (np.isfinite(best_train_loss)
                           and loss0 > rollback_on_spike * best_train_loss))

    def _do_rollback(loss_mean, at_epoch):
        nonlocal params, opt_state, ema_params, n_rollbacks
        n_rollbacks += 1
        params = _snapshot(best_params)
        opt_state = _reset_adam_moments(opt_state)
        # back the lr off: re-entering the same loss-surface region at
        # the lr that just exploded re-explodes (field-tested)
        opt_state, scale = _scale_injected_step(opt_state, 0.5)
        if ema_params is not None:
            ema_params = _snapshot(best_params)
        if verbose:
            backoff = (f", lr scale -> {scale:g}" if scale is not None
                       else "")
            print(f"loss spike at epoch {at_epoch + 1} (train loss "
                  f"{float(loss_mean[0]):.3e} vs best {best_train_loss:.3e});"
                  f" rolled back to the epoch-{best_epoch + 1} checkpoint, "
                  f"Adam moments reset{backoff} "
                  f"({n_rollbacks}/{max_rollbacks})", flush=True)

    ckpt_path = os.path.join(model_save_path, model_name)
    result_path = os.path.join(model_save_path, result_name)
    result = TrainResult(best_val_epoch=best_epoch, best_val_metric=best_val,
                         loss_train=np.zeros((0,)), loss_val=np.zeros((0,)),
                         lr_history=np.zeros((0,)))

    async_ckpt = None
    if async_checkpoint:
        from .checkpoint import AsyncCheckpointer
        async_ckpt = AsyncCheckpointer(ckpt_path + ".orbax")

    # resumed_ema: with EMA, checkpoints store the EMA average under
    # "params" (the deployable tree) and the raw trajectory under
    # "train_params" — resume restores BOTH so training continues the raw
    # params while the EMA average carries over (VERDICT r2 weak #7)
    resumed_ema = None
    if resume and async_ckpt is not None and \
            async_ckpt.latest_step() is not None:
        eval_tree, opt_state, train_tree = async_ckpt.restore(
            params, opt_state, with_train_params=True)
        params = train_tree if train_tree is not None else eval_tree
        resumed_ema = eval_tree if train_tree is not None else None
        if verbose:
            print(f"resumed params + optimizer state from "
                  f"{ckpt_path}.orbax @ step {async_ckpt.latest_step()}")
    elif resume and os.path.exists(ckpt_path):
        from .checkpoint import load_checkpoint
        eval_tree, opt_state, train_tree = load_checkpoint(
            ckpt_path, params, opt_state, with_train_params=True)
        params = train_tree if train_tree is not None else eval_tree
        resumed_ema = eval_tree if train_tree is not None else None
        if verbose:
            print(f"resumed params + optimizer state from {ckpt_path}")

    ema_params = None
    ema_step = None
    if ema_decay is not None and 0.0 < ema_decay < 1.0:
        # real device copies — train_step donates the param buffers, so the
        # EMA tree must not alias them
        ema_params = jax.tree_util.tree_map(
            lambda x: jax.numpy.array(x, copy=True),
            resumed_ema if resumed_ema is not None else params)
        ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda ev, pv: ema_decay * ev + (1.0 - ema_decay) * pv, e, p))

    runner = None
    if device_loop:
        from .device_loop import DeviceEpochRunner
        runner = DeviceEpochRunner(
            train_step, eval_step, train_loader, valid_loader,
            ema_decay=ema_decay if ema_step is not None else None,
            epochs_per_dispatch=epochs_per_dispatch, mode=mode,
            verbose=verbose)
    block_k = runner.epochs_per_dispatch if runner is not None else 1
    if block_k > 1 and plateau is not None:
        raise ValueError(
            "epochs_per_dispatch > 1 is incompatible with the plateau "
            "scheduler (it adjusts the lr on host once per epoch)")

    # host-loop path: keep device arrays and fetch in chunks — fetching per
    # step serializes the epoch on host round-trips (10-100 ms each on a
    # remote-execution backend, >100x the 1 ms step); the chunk bound keeps
    # the dispatch queue (and the input buffers it pins) finite
    flush_every = 64

    def _epoch_log(epoch, loss_mean, val_metric, dt):
        if verbose:
            loss_str = " | ".join(f"loss {i}: {v:.3e}"
                                  for i, v in enumerate(loss_mean) if v > 0)
            print(f"epoch [{epoch + 1}/{epochs}] {loss_str} "
                  f"| val: {val_metric:.3e} "
                  f"| best: {best_val:.3e} @ {best_epoch + 1} "
                  f"| early stop: {stop_counter} | {dt:.1f}s", flush=True)
        try:
            import json
            with open(result_path.rsplit(".", 1)[0] + ".jsonl", "a") as f:
                f.write(json.dumps(dict(
                    epoch=epoch, loss=[float(v) for v in loss_mean],
                    val=val_metric, best=best_val,
                    lr=(float(lr_schedule((epoch + 1) * len(train_loader)
                                          - 1))
                        if lr_schedule is not None else
                        (plateau.lr if plateau is not None else None)),
                    seconds=round(dt, 2))) + "\n")
        except OSError:
            pass

    if block_k > 1:
        # k epochs per dispatch: on-device best tracking, block-granular
        # host bookkeeping.  `best_params` is donated each call and
        # replaced by the returned (exact best-epoch) tree.
        epoch = start_epoch
        halted = False
        while epoch < epochs and not halted:
            k = min(block_k, epochs - epoch)
            t0 = time.perf_counter()
            (params, opt_state, rng, ema_params, _blk_best, best_params,
             losses_blk, vals_blk) = runner.run_block(
                params, opt_state, rng, ema_params, best_val, best_params,
                epoch, k)
            dt = (time.perf_counter() - t0) / k
            improved_any = False
            it0 = it
            it += k * runner.n_batches  # all k epochs did train on device
            resume_at = None
            for i in range(k):
                loss_mean = losses_blk[i].mean(axis=0)
                loss_train.append(loss_mean)
                if _spiked(loss_mean):
                    if n_rollbacks >= max_rollbacks:
                        print(f"loss spike at epoch {epoch + i + 1} with "
                              f"the rollback budget exhausted; stopping — "
                              f"best checkpoint from epoch {best_epoch + 1} "
                              f"is preserved", flush=True)
                        halted = True
                        break
                    _do_rollback(loss_mean, epoch + i)
                    resume_at = epoch + i + 1  # rest of block ran on wreck
                    break
                if not np.isfinite(loss_mean).all():
                    print(f"divergence detected at epoch {epoch + i + 1} "
                          f"(non-finite training loss); stopping — best "
                          f"checkpoint from epoch {best_epoch + 1} is "
                          f"preserved", flush=True)
                    halted = True
                    break
                best_train_loss = min(best_train_loss, float(loss_mean[0]))
                val_metric = float(vals_blk[i])
                loss_val.append(val_metric)
                improved = np.isfinite(val_metric) and (
                    val_metric > best_val if mode == "max"
                    else val_metric < best_val)
                if improved:
                    best_val, best_epoch = val_metric, epoch + i
                    stop_counter = 0
                    improved_any = True
                else:
                    stop_counter += 1
                _epoch_log(epoch + i, loss_mean, val_metric, dt)
                if stop_counter > patience:
                    if verbose:
                        print(f"Early stop at epoch {epoch + i + 1}")
                    halted = True
                    break
            if lr_schedule is not None:
                lr_history.extend(np.asarray(jax.vmap(lr_schedule)(
                    np.arange(it0, it))).tolist())
            if improved_any and save_best:
                # best_params IS the best-epoch tree (device-selected);
                # with EMA the raw trajectory is only available at block
                # granularity — save the block-final raw params
                raw = params if ema_params is not None else None
                if async_ckpt is not None:
                    async_ckpt.save(best_epoch, best_params, opt_state,
                                    train_params=raw)
                else:
                    save_checkpoint(ckpt_path, best_params, opt_state,
                                    train_params=raw)
            result = TrainResult(best_val_epoch=best_epoch,
                                 best_val_metric=best_val,
                                 loss_train=np.asarray(loss_train),
                                 loss_val=np.asarray(loss_val),
                                 lr_history=np.asarray(lr_history))
            save_pickle(result.asdict(), result_path)
            epoch = resume_at if resume_at is not None else epoch + k
        epochs = start_epoch  # skip the per-epoch loop below

    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        val_metric = None
        if runner is not None:
            params, opt_state, rng, ema_params, losses_np, val_metric = \
                runner.epoch(params, opt_state, rng, ema_params, epoch)
            n_steps = runner.n_batches
            it += n_steps
            loss_mean = losses_np.mean(axis=0)
        else:
            epoch_losses, pending, n_steps = [], [], 0
            for batch in train_loader:
                params, opt_state, rng, losses = train_step(
                    params, opt_state, batch, rng)
                if ema_step is not None:
                    ema_params = ema_step(ema_params, params)
                pending.append(losses)
                if len(pending) >= flush_every:
                    epoch_losses.extend(jax.device_get(pending))
                    pending = []
                it += 1
                n_steps += 1
            epoch_losses.extend(jax.device_get(pending))
            loss_mean = np.mean(np.asarray(epoch_losses), axis=0)
        if lr_schedule is not None:
            lr_history.extend(np.asarray(
                jax.vmap(lr_schedule)(np.arange(it - n_steps, it))).tolist())
        loss_train.append(loss_mean)

        if _spiked(loss_mean):
            if n_rollbacks >= max_rollbacks:
                print(f"loss spike at epoch {epoch + 1} with the rollback "
                      f"budget exhausted; stopping — best checkpoint from "
                      f"epoch {best_epoch + 1} is preserved", flush=True)
                break
            _do_rollback(loss_mean, epoch)
            continue

        # failure detection: a diverged run never recovers through Adam
        # state — stop, keep the last good checkpoint
        if not np.isfinite(loss_mean).all():
            print(f"divergence detected at epoch {epoch + 1} "
                  f"(non-finite training loss); stopping — best checkpoint "
                  f"from epoch {best_epoch + 1} is preserved", flush=True)
            break
        best_train_loss = min(best_train_loss, float(loss_mean[0]))

        eval_params = ema_params if ema_params is not None else params
        if val_metric is None:
            val_metric = validate_epoch(eval_step, eval_params, valid_loader)
        loss_val.append(val_metric)

        if plateau is not None:
            # reference EPOCH_SCHEDULERS placement (utils_ft.py:813-817):
            # scheduler.step(val_metric) once per epoch, after validation
            opt_state = plateau.step(opt_state, val_metric)

        improved = np.isfinite(val_metric) and (
            val_metric > best_val if mode == "max" else val_metric < best_val)
        if improved:
            best_val, best_epoch, stop_counter = val_metric, epoch, 0
            best_params = _snapshot(eval_params)
            raw = params if ema_params is not None else None
            if save_best and async_ckpt is not None:
                async_ckpt.save(epoch, eval_params, opt_state,
                                train_params=raw)
            elif save_best:
                save_checkpoint(ckpt_path, eval_params, opt_state,
                                train_params=raw)
        else:
            stop_counter += 1

        if verbose:
            dt = time.perf_counter() - t0
            loss_str = " | ".join(f"loss {i}: {v:.3e}"
                                  for i, v in enumerate(loss_mean) if v > 0)
            print(f"epoch [{epoch + 1}/{epochs}] {loss_str} "
                  f"| val: {val_metric:.3e} "
                  f"| best: {best_val:.3e} @ {best_epoch + 1} "
                  f"| early stop: {stop_counter} | {dt:.1f}s", flush=True)

        result = TrainResult(best_val_epoch=best_epoch,
                             best_val_metric=best_val,
                             loss_train=np.asarray(loss_train),
                             loss_val=np.asarray(loss_val),
                             lr_history=np.asarray(lr_history))
        save_pickle(result.asdict(), result_path)
        # machine-readable epoch log next to the pickle
        try:
            import json
            with open(result_path.rsplit(".", 1)[0] + ".jsonl", "a") as f:
                f.write(json.dumps(dict(
                    epoch=epoch, loss=[float(v) for v in loss_mean],
                    val=val_metric, best=best_val,
                    lr=(float(lr_schedule(it - 1))
                        if lr_schedule is not None else
                        (plateau.lr if plateau is not None else None)),
                    seconds=round(time.perf_counter() - t0, 2))) + "\n")
        except OSError:
            pass

        if stop_counter > patience:
            if verbose:
                print(f"Early stop at epoch {epoch + 1}")
            break

    if async_ckpt is not None:
        async_ckpt.wait()

    result.best_params = best_params
    return best_params, params, opt_state, result
