"""Wall-clock + RSS timers (reference: libs/utils.py:154-235)."""
from __future__ import annotations

import time
from contextlib import contextmanager


def _rss_gb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 2**30
    except Exception:
        return float("nan")


@contextmanager
def simple_timer(title: str = ""):
    t0 = time.perf_counter()
    yield
    print(f"{title} - done in {time.perf_counter() - t0:.4f} s")


@contextmanager
def timer(title: str = ""):
    t0, m0 = time.perf_counter(), _rss_gb()
    yield
    dt, dm = time.perf_counter() - t0, _rss_gb() - m0
    print(f"{title} - done in {dt:.2f} s, mem delta {dm:+.3f} GB")


# reference alias (libs/utils.py:225-235): `trace` is the wall+RSS timer
trace = timer
