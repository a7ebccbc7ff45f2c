"""galerkin_transformer_tpu — a TPU-native operator-learning framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
Galerkin Transformer (Cao, NeurIPS 2021; reference implementation surveyed
in /root/repo/SURVEY.md).  The compute path is functional JAX with fused
Pallas kernels for the softmax-free attention cores; models are Flax linen
modules; parallelism is expressed through `jax.sharding.Mesh` + `shard_map`
collectives rather than any torch-style device loop.

Top-level namespaces:
    ops       functional numerics (attention kernels, spectral convs,
              MXU-friendly bilinear interpolation, FEM featurization)
    models    linen modules (layers, encoders, regressors, scalers, models)
    data      numpy-side datasets (.mat loaders + synthetic PDE generators)
    train     losses, schedules, trainer, checkpointing
    parallel  mesh construction, sharded train steps, sequence-parallel
              Galerkin attention
    utils     PRNG plumbing, timers, config, naming, profiling
"""

__version__ = "0.1.0"

from . import ops, models, data, train, parallel, utils  # noqa: F401
