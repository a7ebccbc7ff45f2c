"""Parameter / result checkpointing.

Best-val checkpointing mirrors the reference's run_train behaviour
(utils_ft.py:800-808, 851-860): params saved on every validation
improvement, the result dict pickled each epoch.  Serialization is flax
msgpack (framework-neutral bytes), with optimizer state included so resume
actually restores momentum — the reference saved it but never reloaded it
(utils_ft.py:858, SURVEY §5).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Optional[Any] = None,
                    train_params: Optional[Any] = None):
    """`params` is the deployable tree (the EMA average when EMA is on);
    `train_params` optionally carries the raw training trajectory so a
    resumed run continues the raw params, not the average."""
    import jax

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # one batched device->host transfer up front: to_bytes on device trees
    # fetches leaf-by-leaf, which on a remote-execution backend costs a
    # round-trip per leaf
    params, opt_state, train_params = jax.device_get(
        (params, opt_state, train_params))
    payload = {"params": serialization.to_bytes(params)}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(opt_state)
    if train_params is not None:
        payload["train_params"] = serialization.to_bytes(train_params)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Optional[Any] = None,
                    with_train_params: bool = False):
    """Returns `params` (deployable tree), optionally followed by
    `opt_state`, optionally followed by the raw `train_params` tree
    (None for checkpoints written without EMA)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    out = (params,)
    if opt_state_template is not None and "opt_state" in payload:
        out = out + (serialization.from_bytes(opt_state_template,
                                              payload["opt_state"]),)
    if with_train_params:
        tp = payload.get("train_params")
        out = out + (serialization.from_bytes(params_template, tp)
                     if tp is not None else None,)
    return out if len(out) > 1 else out[0]


class AsyncCheckpointer:
    """Orbax-backed asynchronous checkpointing (production path).

    `save()` snapshots device arrays to host synchronously, then
    serialization and file IO proceed on a background thread — the train
    loop never stalls on checkpoint writes.  Orbax coordinates commits
    across `jax.process_count()` hosts, so the same call is multi-host
    safe on a TPU pod.  The msgpack helpers above remain the
    dependency-light single-file format; this class is the scalable one.

    Usage:
        ckpt = AsyncCheckpointer(dir, max_to_keep=3)
        ckpt.save(step, params, opt_state)      # returns immediately
        params, opt_state = ckpt.restore(params, opt_state)  # latest step
        ckpt.wait(); ckpt.close()
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True))

    def save(self, step: int, params: Any, opt_state: Optional[Any] = None,
             train_params: Optional[Any] = None):
        """`params` = deployable tree (EMA average when EMA is on);
        `train_params` = raw training trajectory for resume."""
        tree = {"params": params}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        if train_params is not None:
            tree["train_params"] = train_params
        self._mngr.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, params_template: Any,
                opt_state_template: Optional[Any] = None,
                step: Optional[int] = None,
                with_train_params: bool = False):
        step = self.latest_step() if step is None else step
        tree = {"params": params_template}
        if opt_state_template is not None:
            tree["opt_state"] = opt_state_template
        if with_train_params:
            try:
                out = self._mngr.restore(
                    step, args=self._ocp.args.StandardRestore(
                        dict(tree, train_params=params_template)))
            except BaseException:  # checkpoint written without EMA
                out = dict(self._mngr.restore(
                    step, args=self._ocp.args.StandardRestore(tree)),
                    train_params=None)
        else:
            out = self._mngr.restore(
                step, args=self._ocp.args.StandardRestore(tree))
        result = (out["params"],)
        if opt_state_template is not None:
            result = result + (out["opt_state"],)
        if with_train_params:
            result = result + (out.get("train_params"),)
        return result if len(result) > 1 else result[0]

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_pickle(obj: Any, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
