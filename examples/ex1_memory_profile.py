"""Per-attention-type memory/FLOPs/time profiling
(reference: examples/ex1_memory_profile.py).

Uses XLA cost analysis (exact FLOPs / HBM bytes of the compiled program)
and steady-state step timing instead of torch.autograd.profiler.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.models import SimpleTransformer
from galerkin_transformer_tpu.train.losses import WeightedL2Loss
from galerkin_transformer_tpu.utils import load_config
from galerkin_transformer_tpu.utils.profiling import (ProfileResult,
                                                      compiled_cost,
                                                      profile_step)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--attention-types", nargs="+",
                   default=["galerkin", "fourier", "linear", "softmax"])
    p.add_argument("--num-iter", type=int, default=5)
    p.add_argument("--trace-dir", type=str, default=None)
    args = p.parse_args(argv)

    n, bsz = args.seq_len, args.batch_size
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((bsz, n, 1)), jnp.float32)
    pos = jnp.broadcast_to(
        jnp.linspace(0, 1, n, dtype=jnp.float32)[None, :, None], (bsz, n, 1))
    target = jnp.asarray(rng.standard_normal((bsz, n, 2)), jnp.float32)
    loss_fn = WeightedL2Loss(regularizer=False, h=1 / n)

    result = ProfileResult()
    for atype in args.attention_types:
        cfg = load_config("ex1_burgers")
        cfg["attention_type"] = atype
        model = SimpleTransformer.from_config(cfg)
        params = model.init(jax.random.key(0), node, None, pos, pos)["params"]

        def train_like(params):
            def loss(p):
                out = model.apply({"params": p}, node, None, pos, pos)
                res = loss_fn(out["preds"][..., 0], target[..., 0],
                              targets_prime=target[..., 1])
                return res.loss
            return jax.grad(loss)(params)

        cost = compiled_cost(train_like, params)
        timing = profile_step(train_like, params, iters=args.num_iter,
                              trace_dir=args.trace_dir)
        result.add(atype, cost, timing)
        print(f"{atype}: {timing['mean_s']:.4f}s/step", flush=True)

    print()
    print(result.table())
    return result


if __name__ == "__main__":
    main()
