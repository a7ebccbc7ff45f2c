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


def _chained_runner(fn: Callable):
    """One jitted program that executes `fn` a (runtime-dynamic) number of
    times with a forced data dependence between iterations (a ~0
    perturbation of every float arg by one element of the previous output).

    Why: on remote-executed backends (the axon TPU tunnel),
    ``block_until_ready`` confirms dispatch, not completion, and repeated
    identical dispatches can be elided — a naive python timing loop then
    measures dispatch throughput, not device time.  Chaining inside one
    program and fetching one element at the end measures real execution.
    """
    import jax.numpy as jnp

    def run(n_iters, args):
        def body(_, args):
            out = fn(*args)
            # touch one element of EVERY float output leaf so no part of
            # fn's computation is dead-code-eliminated inside the loop
            eps = sum(l.reshape(-1)[0].astype(jnp.float32)
                      for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)) * 1e-38

            def perturb(a):
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                          jnp.floating):
                    return a + eps.astype(a.dtype)
                return a

            return jax.tree.map(perturb, args)

        return jax.lax.fori_loop(0, n_iters, body, args,
                                 unroll=False)

    return jax.jit(run)


def measure(fn: Callable, *args, iters: int = 20, iters_lo: int = 5,
            min_signal_s: float = 0.05, repeats: int = 3,
            max_iters: int = 100_000) -> float:
    """Seconds per execution of `fn(*args)`, robust to async/remote dispatch.

    Runs the chained loop at two iteration counts and takes the slope, so
    the constant dispatch + host-fetch round-trip cancels; escalates the
    iteration count until the slope signal dominates round-trip jitter
    (needed for sub-0.1 ms kernels through a multi-ms tunnel).
    """
    import jax.numpy as jnp

    runner = _chained_runner(fn)
    args_t = tuple(args)

    def run_t(n):
        t0 = time.perf_counter()
        res = runner(jnp.int32(n), args_t)
        np.asarray(jax.numpy.ravel(jax.tree.leaves(res)[0])[0])
        return time.perf_counter() - t0

    run_t(1)  # compile + warm
    n_lo, n_hi = max(1, iters_lo), max(iters, iters_lo + 1)
    while True:
        t_lo = min(run_t(n_lo) for _ in range(repeats))
        t_hi = min(run_t(n_hi) for _ in range(repeats))
        signal = t_hi - t_lo
        if signal >= min_signal_s or n_hi >= max_iters:
            return max(signal, 1e-9) / (n_hi - n_lo)
        n_lo, n_hi = n_hi, min(n_hi * 5, max_iters)


def profile_step(fn: Callable, *args, warmup: int = 2, iters: int = 20,
                 trace_dir: Optional[str] = None) -> dict:
    """Steady-state timing of a jitted callable, optional profiler trace.

    Timing uses `measure` (chained in-program iterations, host fetch) —
    see _chained_runner for why wall-clocking dispatches is wrong here.
    """
    del warmup  # the chained harness warms itself
    if trace_dir:
        jitted = jax.jit(fn)
        out = jitted(*args)
        np.asarray(jax.numpy.ravel(jax.tree.leaves(out)[0])[0])
        with jax.profiler.trace(trace_dir):
            out = jitted(*args)
            jax.block_until_ready(out)

    t = measure(fn, *args, iters=iters)
    return dict(mean_s=t, min_s=t, std_s=0.0, iters=iters)


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
