"""Profiling / cost-analysis harness.

TPU-native replacement for the reference's ``torch.autograd.profiler``
harness + ``ProfileResult`` table parser (utils_ft.py:864-963,
examples/*_memory_profile.py): XLA's own cost analysis gives exact FLOPs
and HBM traffic for the *compiled* program, `jax.profiler` writes traces,
and `profile_step` measures steady-state wall time.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np


def compiled_cost(fn: Callable, *args, **kwargs) -> dict:
    """Lower+compile `fn` and return XLA's cost analysis.

    Keys of interest: 'flops', 'bytes accessed', and per-memory-space
    traffic.  These are analytical values for the optimized HLO.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    mem = compiled.memory_analysis()
    out = dict(cost) if cost else {}
    if mem is not None:
        for key in ("temp_size_in_bytes", "argument_size_in_bytes",
                    "output_size_in_bytes", "generated_code_size_in_bytes"):
            if hasattr(mem, key):
                out[key] = getattr(mem, key)
    return out


def profile_step(fn: Callable, *args, warmup: int = 2, iters: int = 10,
                 trace_dir: Optional[str] = None) -> dict:
    """Steady-state timing of a jitted callable, optional profiler trace."""
    jitted = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = jitted(*args)
    jax.block_until_ready(out)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            out = jitted(*args)
            jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return dict(mean_s=float(times.mean()), min_s=float(times.min()),
                std_s=float(times.std()), iters=iters)


class ProfileResult:
    """Aggregate per-attention-type profiling rows into a comparison table.

    API-parity stand-in for the reference's pandas parser of the torch
    profiler text table — here rows are structured dicts from
    `compiled_cost`/`profile_step`.
    """

    def __init__(self):
        self.rows: list[dict] = []

    def add(self, name: str, cost: dict, timing: dict):
        flops = cost.get("flops", float("nan"))
        t = timing["mean_s"]
        self.rows.append(dict(
            name=name,
            mean_s=t,
            min_s=timing["min_s"],
            gflops=flops / 1e9,
            tflops_per_s=(flops / t) / 1e12 if t else float("nan"),
            hbm_gb=cost.get("bytes accessed", float("nan")) / 2 ** 30,
            temp_mb=cost.get("temp_size_in_bytes", float("nan")) / 2 ** 20,
        ))

    def table(self) -> str:
        hdr = (f"{'name':<24}{'mean_s':>10}{'min_s':>10}{'GFLOPs':>10}"
               f"{'TFLOP/s':>10}{'HBM_GB':>10}{'temp_MB':>10}")
        lines = [hdr, "-" * len(hdr)]
        for r in self.rows:
            lines.append(
                f"{r['name']:<24}{r['mean_s']:>10.4f}{r['min_s']:>10.4f}"
                f"{r['gflops']:>10.2f}{r['tflops_per_s']:>10.3f}"
                f"{r['hbm_gb']:>10.3f}{r['temp_mb']:>10.1f}")
        return "\n".join(lines)
