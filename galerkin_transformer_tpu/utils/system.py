"""System / file utilities (reference: libs/utils.py:21-121, 204-283)."""
from __future__ import annotations

import os
import platform
import sys
from typing import Optional


def is_interactive() -> bool:
    """True inside IPython/Jupyter (libs/utils.py:21)."""
    try:
        get_ipython  # type: ignore  # noqa: B018
        return True
    except NameError:
        return False


def get_size(obj, seen: Optional[set] = None) -> int:
    """Recursive in-memory size of a python object (libs/utils.py:48)."""
    size = sys.getsizeof(obj)
    seen = seen if seen is not None else set()
    oid = id(obj)
    if oid in seen:
        return 0
    seen.add(oid)
    if isinstance(obj, dict):
        size += sum(get_size(v, seen) for v in obj.values())
        size += sum(get_size(k, seen) for k in obj.keys())
    elif hasattr(obj, "__dict__"):
        size += get_size(obj.__dict__, seen)
    elif hasattr(obj, "__iter__") and not isinstance(obj, (str, bytes,
                                                           bytearray)):
        try:
            size += sum(get_size(i, seen) for i in obj)
        except TypeError:
            pass
    return size


def get_file_size(path: str, unit: str = "MB") -> float:
    div = {"B": 1, "KB": 2 ** 10, "MB": 2 ** 20, "GB": 2 ** 30}[unit]
    return os.path.getsize(path) / div


def find_files(name: str, path: str) -> list:
    """All files whose name contains `name` under `path` (libs/utils.py:209)."""
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if name in f:
                out.append(os.path.join(root, f))
    return out


def get_memory(unit: str = "GB") -> float:
    """Current process RSS (libs/utils.py:204)."""
    try:
        import psutil
        div = {"MB": 2 ** 20, "GB": 2 ** 30}[unit]
        return psutil.Process().memory_info().rss / div
    except Exception:
        return float("nan")


def get_system() -> dict:
    """Hardware/software report incl. accelerator info (libs/utils.py:87)."""
    info = dict(
        platform=platform.system(),
        platform_release=platform.release(),
        architecture=platform.machine(),
        processor=platform.processor(),
        python=sys.version.split()[0],
        cpu_count=os.cpu_count(),
    )
    try:
        import jax
        info["jax_version"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    try:
        import psutil
        info["ram_gb"] = round(psutil.virtual_memory().total / 2 ** 30, 2)
    except Exception:
        pass
    return info
