"""Config handling.

The reference merges three layers: per-example blocks in config.yml,
argparse overrides copied in by key, and runtime-computed entries
(reference: examples/ex1_burgers.py:50-57, ex2_darcy.py:67-82; models absorb
the dict via ``defaultdict(lambda: None)`` — libs/model.py:753-755).

Here the same protocol is kept but made explicit: `load_config` reads a YAML
block, `merge_config` overlays dicts/namespaces, and model constructors
filter the dict to their declared fields (`models.from_config`).
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Mapping

import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONFIG_PATH = os.path.join(REPO_ROOT, "config.yml")
MODEL_PATH = os.environ.get("MODEL_PATH", os.path.join(REPO_ROOT, "models_ckpt"))
DATA_PATH = os.environ.get("DATA_PATH", os.path.join(REPO_ROOT, "data_files"))
FIG_PATH = os.environ.get("FIG_PATH", os.path.join(REPO_ROOT, "figures"))


class DotDict(dict):
    """dict with attribute access (reference: libs/utils.py:285-302)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            return None

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def load_config(block: str, path: str | None = None) -> DotDict:
    path = path or CONFIG_PATH
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if block not in cfg:
        raise KeyError(f"config block {block!r} not in {path}")
    return DotDict(cfg[block])


def merge_config(base: Mapping[str, Any], *overlays: Any) -> DotDict:
    """Overlay dicts / argparse namespaces onto `base`.

    Argparse namespaces only override keys that already exist in `base`,
    matching the reference's copy-by-name loop (ex1_burgers.py:54-57).
    """
    out = DotDict(dict(base))
    for ov in overlays:
        if ov is None:
            continue
        if isinstance(ov, argparse.Namespace):
            for k in vars(ov):
                # None = flag not provided; never clobber a config value
                if k in out and getattr(ov, k) is not None:
                    out[k] = getattr(ov, k)
        else:
            out.update(ov)
    return out
