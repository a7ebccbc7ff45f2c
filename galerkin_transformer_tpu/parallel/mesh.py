"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY §2.8); parallelism here is
a first-class TPU-native component: a `jax.sharding.Mesh` with named axes
('data', 'seq'), NamedShardings for batch-parallel training, and (in
parallel.galerkin) a sequence-sharded Galerkin attention whose d×d
reduction is a per-shard partial sum + psum over the 'seq' axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ('data', 'seq').  Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // seq
    assert data * seq == n, f"mesh {data}x{seq} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, axis_names=("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a dict batch with batch-dim sharding over 'data'.

    Arrays whose leading dim is not divisible by the data-axis size (e.g.
    per-dataset constants like pos/grid broadcast along batch) are
    replicated.
    """
    import warnings

    n_data = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if v.ndim >= 1 and v.shape[0] % n_data == 0 and v.shape[0] > 1:
            out[k] = jax.device_put(v, batch_sharding(mesh))
        else:
            if v.ndim >= 1 and v.shape[0] > 1:
                # a real batch that just doesn't divide the data axis is a
                # silent perf foot-gun: every device holds the full array
                warnings.warn(
                    f"shard_batch: '{k}' with leading dim {v.shape[0]} is "
                    f"not divisible by data axis size {n_data}; replicating "
                    f"instead of sharding", stacklevel=2)
            out[k] = jax.device_put(v, replicate(mesh))
    return out


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (TPU pods / multi-process CPU testing).

    On Cloud TPU the arguments are auto-detected from the environment;
    returns the global device count.  Call once, before any jax op, on
    every host of the slice; then `make_mesh()` spans all hosts and
    per-host `DataLoader`s should shard the sample space by
    `jax.process_index()`.
    """
    import jax

    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())
