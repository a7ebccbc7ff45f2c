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


def save_pickle(obj: Any, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
