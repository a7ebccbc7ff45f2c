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


def save_checkpoint(path: str, params: Any, opt_state: Optional[Any] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": serialization.to_bytes(params)}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(opt_state)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Optional[Any] = None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    if opt_state_template is not None and "opt_state" in payload:
        opt_state = serialization.from_bytes(opt_state_template,
                                             payload["opt_state"])
        return params, opt_state
    return params


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

    def save(self, step: int, params: Any, opt_state: Optional[Any] = None):
        tree = {"params": params}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        self._mngr.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, params_template: Any,
                opt_state_template: Optional[Any] = None,
                step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        tree = {"params": params_template}
        if opt_state_template is not None:
            tree["opt_state"] = opt_state_template
        out = self._mngr.restore(
            step, args=self._ocp.args.StandardRestore(tree))
        if opt_state_template is not None:
            return out["params"], out["opt_state"]
        return out["params"]

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
