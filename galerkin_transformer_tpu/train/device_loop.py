"""Device-resident epoch execution: one XLA program per epoch.

The host-driven loop in `trainer.run_train` (reference semantics:
libs/utils_ft.py:714-861) feeds one batch per dispatch.  On a remote-
execution backend every host->device batch upload costs ~10-100 ms of
round-trip latency, which dominates the ~1 ms compiled step: a 134-step
Burgers epoch whose compute is 0.15 s takes ~19 s of wall clock.

`DeviceEpochRunner` removes the host from the hot path entirely:

  * the FULL training/validation sets are uploaded to HBM once,
  * each epoch is ONE jitted call — on-device `jax.random.permutation`
    shuffle, `lax.scan` over minibatches (gather + train step + optional
    parameter EMA), then a scanned validation sweep,
  * the host fetches two small arrays per epoch (per-step losses and the
    validation metric).

This is the TPU-native shape of the reference's epoch loop: the sequence
of optimizer steps is a sequential dependence chain, so scanning it inside
one program costs nothing in parallelism and removes ~n_batches round
trips.  Use it whenever the dataset fits in HBM on a single process; the
host `DataLoader` path remains for multi-host sharding and out-of-core
data.

Semantics vs the host loop: identical batch maths (same `train_step`),
but the shuffle stream is `jax.random.permutation` instead of numpy, and
the validation mean is weighted by batch size (the host loop averages
per-batch means, which differs only when the last batch is ragged).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def stack_dataset(dataset) -> Dict[str, np.ndarray]:
    """Stack every sample of a map-style dataset into one array per key."""
    items = [dataset[i] for i in range(len(dataset))]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _nbytes(tree) -> int:
    return sum(np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(tree))


class DeviceEpochRunner:
    """Runs `run_train`'s inner epoch as a single jitted device program.

    Parameters mirror what `run_train` already receives; construction
    uploads both datasets to the default device.
    """

    def __init__(self, train_step: Callable, eval_step: Callable,
                 train_loader, valid_loader,
                 ema_decay: Optional[float] = None,
                 shuffle_seed: Optional[int] = None,
                 epochs_per_dispatch: int = 1,
                 mode: str = "min",
                 verbose: bool = True):
        if getattr(train_loader, "num_shards", 1) != 1:
            raise ValueError(
                "DeviceEpochRunner is single-process; use the host "
                "DataLoader path for multi-host sharded input")
        self.train_step = train_step
        self.eval_step = eval_step
        self.batch_size = train_loader.batch_size
        self.shuffle = bool(getattr(train_loader, "shuffle", False))
        self.ema_decay = ema_decay

        train_np = stack_dataset(train_loader.dataset)
        valid_np = stack_dataset(valid_loader.dataset)
        self.n_train = len(train_loader.dataset)
        self.n_batches = self.n_train // self.batch_size
        if verbose:
            gb = (_nbytes(train_np) + _nbytes(valid_np)) / 2 ** 30
            k = max(1, int(epochs_per_dispatch))
            per = "1 dispatch/epoch" if k == 1 else \
                f"1 dispatch per {k} epochs"
            print(f"device-resident data: {self.n_train} train / "
                  f"{len(valid_loader.dataset)} valid samples "
                  f"({gb:.2f} GiB in HBM), {self.n_batches} steps/epoch, "
                  f"{per}")
        rem = self.n_train - self.n_batches * self.batch_size
        if rem and not getattr(train_loader, "drop_last", True):
            # the scanned epoch needs static batch shapes; silently training
            # on fewer samples than the host loop would is a footgun
            raise ValueError(
                f"device epoch loop requires drop_last=True when the train "
                f"set is ragged ({self.n_train} % {self.batch_size} = {rem} "
                f"samples would be dropped); pass drop_last=True to the "
                f"DataLoader or use the host loop (--no-device-data)")
        self.train_data = {k: jnp.asarray(v) for k, v in train_np.items()}

        # pre-batch the validation set: full batches + optional ragged tail
        vbs = valid_loader.batch_size
        n_valid = len(valid_loader.dataset)
        n_full = n_valid // vbs
        self.valid_full = {
            k: jnp.asarray(v[: n_full * vbs].reshape((n_full, vbs)
                                                     + v.shape[1:]))
            for k, v in valid_np.items()} if n_full else None
        self.valid_tail = (
            {k: jnp.asarray(v[n_full * vbs:]) for k, v in valid_np.items()}
            if n_valid % vbs else None)
        self._valid_counts = (n_full * vbs, n_valid % vbs)

        # follow the DataLoader's seed (the driver's --seed) so device- and
        # host-loop runs draw from the same run-identity, not a fixed const
        if shuffle_seed is None:
            shuffle_seed = getattr(train_loader, "seed", 1127802)
        self._key = jax.random.key(shuffle_seed)
        self.epochs_per_dispatch = max(1, int(epochs_per_dispatch))
        self.mode = mode
        self._epoch_fn = _jitted_epoch(*self._cache_key())
        self._block_fn, self._block_k = None, 0  # built lazily per length

    def _cache_key(self):
        return (self.train_step, self.eval_step, self.shuffle,
                self.n_train, self.batch_size, self.n_batches,
                self.ema_decay) + self._valid_counts

    def epoch(self, params, opt_state, rng, ema_params, epoch_idx: int):
        """One epoch on device.  Returns (params, opt_state, rng,
        ema_params, losses [np, (n_batches, n_losses)], val_metric)."""
        key = jax.random.fold_in(self._key, epoch_idx)
        params, opt_state, rng, ema_params, losses, val = self._epoch_fn(
            params, opt_state, rng, ema_params, key, self.train_data,
            self.valid_full, self.valid_tail)
        losses, val = jax.device_get((losses, val))
        return params, opt_state, rng, ema_params, np.asarray(losses), \
            float(val)

    def _build_block(self, k: int):
        """k epochs as ONE jitted program (one dispatch, one host fetch)."""
        return _jitted_block(self._cache_key(), self.mode, k)

    def run_block(self, params, opt_state, rng, ema_params,
                  best_val: float, best_params, start_epoch: int, k: int):
        """Run epochs [start_epoch, start_epoch+k) in one dispatch.

        Returns (params, opt_state, rng, ema_params, best_val [float],
        best_params [device tree], losses [np, (k, n_batches, n_losses)],
        vals [np, (k,)]).  `best_params` must be a device tree that may
        be donated (pass a snapshot, not the live params).
        """
        if self._block_fn is None or self._block_k != k:
            self._block_fn = self._build_block(k)
            self._block_k = k
        keys = jnp.stack([jax.random.fold_in(self._key, e)
                          for e in range(start_epoch, start_epoch + k)])
        (params, opt_state, rng, ema_params, best_val, best_params,
         losses, vals) = self._block_fn(
            params, opt_state, rng, ema_params,
            jnp.float32(best_val), best_params, keys, self.train_data,
            self.valid_full, self.valid_tail)
        best_val_h, losses, vals = jax.device_get((best_val, losses, vals))
        return (params, opt_state, rng, ema_params, float(best_val_h),
                best_params, np.asarray(losses), np.asarray(vals))


def _build_epoch(train_step, eval_step, shuffle, n_train, bsz, n_batches,
                 decay, n_full_samples, n_tail):
    """The one-epoch device program (pure function of its arguments).

    valid_full/valid_tail are jit ARGUMENTS, not closure captures:
    captured device arrays are baked into the HLO as constants, and on a
    remote-compile backend a GB-scale validation set blows the
    compile-request size limit (observed: HTTP 413 at ex4 n=4096 with a
    0.66 GB valid set).  None stays None through tracing.
    """

    def epoch(params, opt_state, rng, ema_params, key, train_data,
              valid_full, valid_tail):
        if shuffle:
            perm = jax.random.permutation(key, n_train)
        else:
            perm = jnp.arange(n_train)
        idx = perm[: n_batches * bsz].reshape(n_batches, bsz)

        def body(carry, ids):
            params, opt_state, rng, ema = carry
            batch = {k: jnp.take(v, ids, axis=0)
                     for k, v in train_data.items()}
            params, opt_state, rng, losses = train_step(
                params, opt_state, batch, rng)
            if decay is not None:
                ema = jax.tree_util.tree_map(
                    lambda e, p: decay * e + (1.0 - decay) * p,
                    ema, params)
            return (params, opt_state, rng, ema), jnp.stack(losses)

        (params, opt_state, rng, ema_params), losses = jax.lax.scan(
            body, (params, opt_state, rng, ema_params), idx)

        eval_params = ema_params if decay is not None else params
        total, count = jnp.float32(0.0), 0
        if valid_full is not None:
            metrics = jax.lax.map(
                lambda b: eval_step(eval_params, b), valid_full)
            total = total + jnp.sum(metrics) * (n_full_samples
                                                / metrics.shape[0])
            count += n_full_samples
        if valid_tail is not None:
            total = total + eval_step(eval_params, valid_tail) * n_tail
            count += n_tail
        val_metric = total / count
        return params, opt_state, rng, ema_params, losses, val_metric

    return epoch


@functools.lru_cache(maxsize=64)
def _jitted_epoch(*key):
    """Memoized jitted epoch program.

    Keyed on (train_step, eval_step, loop scalars): two runners built from
    the same step closures and loop geometry share ONE jitted function
    object, so jit's trace cache serves the second runner without a
    recompile (the per-runner closure used to force a fresh ~40 s compile
    in every heavy test — VERDICT r4 item 9)."""
    return jax.jit(_build_epoch(*key), donate_argnums=(0, 1, 3))


@functools.lru_cache(maxsize=64)
def _jitted_block(key, mode, k):
    """Memoized k-epochs-per-dispatch program (see _jitted_epoch).

    Best-val tracking runs ON DEVICE inside the scan so the exact
    best-epoch parameter snapshot survives without a per-epoch host round
    trip: the carry holds (best_val, best_params) and updates them with
    the same min/max rule the trainer applies.  ``k`` only affects the
    scanned key count (shapes), but is part of the memo key so each block
    length keeps its own jit object."""
    epoch_fn = _build_epoch(*key)
    decay = key[6]
    sign = 1.0 if mode == "min" else -1.0

    def block(params, opt_state, rng, ema_params, best_val, best_params,
              keys, train_data, valid_full, valid_tail):
        def body(carry, kk):
            params, opt_state, rng, ema, b_val, b_par = carry
            params, opt_state, rng, ema, losses, val = epoch_fn(
                params, opt_state, rng, ema, kk, train_data,
                valid_full, valid_tail)
            eval_params = ema if decay is not None else params
            better = jnp.isfinite(val) & (sign * val < sign * b_val)
            b_val = jnp.where(better, val, b_val)
            b_par = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better, p, b), b_par, eval_params)
            return (params, opt_state, rng, ema, b_val, b_par), \
                (losses, val)

        carry, (losses, vals) = jax.lax.scan(
            body, (params, opt_state, rng, ema_params, best_val,
                   best_params), keys)
        params, opt_state, rng, ema_params, best_val, best_params = carry
        return (params, opt_state, rng, ema_params, best_val,
                best_params, losses, vals)

    # donate the training state AND the best tree (replaced each call)
    return jax.jit(block, donate_argnums=(0, 1, 3, 5))
