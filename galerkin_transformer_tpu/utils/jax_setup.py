"""Process-wide JAX runtime configuration for framework entry points.

Centralizes what every driver needs:
  * persistent compilation cache (remote-compiled TPU programs on this
    backend take minutes; caching pays for itself on the second run),
  * matmul-precision policy ('highest' for accuracy-critical training,
    default bf16-pass MXU mode for throughput),
  * host-count overrides for CPU-mesh testing.
"""
from __future__ import annotations

import os


def setup(precision: str | None = None,
          cache_dir: str | None = "~/.cache/galerkin_tpu_xla",
          force_host_devices: int | None = None) -> None:
    if force_host_devices:
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={force_host_devices}")
    import jax

    if cache_dir:
        cache_dir = os.path.expanduser(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    if precision:
        jax.config.update("jax_default_matmul_precision", precision)
