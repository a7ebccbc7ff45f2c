"""Inverse-Darcy profiling (reference: examples/ex3_memory_profile.py).

Same harness as ex2_memory_profile but with the ex3 (pointwise-decoder,
coarse-output) configuration.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.data.darcy import DarcyDataset
from galerkin_transformer_tpu.models import FourierTransformer2D
from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
from galerkin_transformer_tpu.utils import load_config
from galerkin_transformer_tpu.utils.profiling import (ProfileResult,
                                                      compiled_cost,
                                                      profile_step)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-grid", type=int, default=141)
    p.add_argument("--n-grid-coarse", type=int, default=36)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--attention-types", nargs="+",
                   default=["galerkin", "fourier", "linear", "softmax"])
    p.add_argument("--num-iter", type=int, default=5)
    args = p.parse_args(argv)

    n, n_c, bsz = args.n_grid, args.n_grid_coarse, args.batch_size
    down, _ = DarcyDataset.get_scaler_sizes(n, n_c)
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((bsz, n, n, 1)), jnp.float32)
    pos = jnp.asarray(rng.random((bsz, n_c * n_c, 2)), jnp.float32)
    grid = jnp.asarray(rng.random((bsz, n_c, n_c, 2)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((bsz, n_c, n_c)), jnp.float32)
    loss_fn = WeightedL2Loss2d(regularizer=False, h=1 / n_c)

    result = ProfileResult()
    for atype in args.attention_types:
        cfg = load_config("ex3_darcy_inv")
        cfg["attention_type"] = atype
        model = FourierTransformer2D.from_config(
            cfg, downscaler_size=down,
            upscaler_size=((n_c, n_c), (n_c, n_c)))
        params = model.init(jax.random.key(0), node, None, pos, grid)["params"]

        def grad_step(params):
            def loss(p):
                out = model.apply({"params": p}, node, None, pos, grid)
                return loss_fn(out["preds"][..., 0], target).loss
            return jax.grad(loss)(params)

        cost = compiled_cost(grad_step, params)
        timing = profile_step(grad_step, params, iters=args.num_iter)
        result.add(atype, cost, timing)
        print(f"{atype}: {timing['mean_s']:.4f}s", flush=True)
    print()
    print(result.table())


if __name__ == "__main__":
    main()
