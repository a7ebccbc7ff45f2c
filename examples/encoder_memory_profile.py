"""Profile a bare N-layer encoder stack per attention type
(reference: examples/encoder_memory_profile.py — whose line 78 references
an undefined `model`; this version runs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from galerkin_transformer_tpu.models import SimpleTransformerEncoderLayer
from galerkin_transformer_tpu.utils.profiling import (ProfileResult,
                                                      compiled_cost,
                                                      profile_step)


class EncoderStack(nn.Module):
    d_model: int
    n_head: int
    n_layers: int
    attention_type: str

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        for i in range(self.n_layers):
            x = SimpleTransformerEncoderLayer(
                d_model=self.d_model, n_head=self.n_head,
                dim_feedforward=2 * self.d_model,
                attention_type=self.attention_type,
                layer_norm=False, attn_norm=True, dropout=0.0,
                ffn_dropout=0.0, name=f"layer{i}")(x, pos, None, deterministic)
        return x


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--d-model", type=int, default=128)
    p.add_argument("--n-head", type=int, default=4)
    p.add_argument("--n-layers", type=int, default=4)
    p.add_argument("--attention-types", nargs="+",
                   default=["galerkin", "fourier", "linear", "softmax"])
    p.add_argument("--num-iter", type=int, default=5)
    args = p.parse_args(argv)

    n, bsz = args.seq_len, args.batch_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bsz, n, args.d_model)), jnp.float32)
    pos = jnp.broadcast_to(
        jnp.linspace(0, 1, n, dtype=jnp.float32)[None, :, None], (bsz, n, 1))

    result = ProfileResult()
    for atype in args.attention_types:
        model = EncoderStack(args.d_model, args.n_head, args.n_layers, atype)
        params = model.init(jax.random.key(0), x, pos)["params"]

        def grad_step(params):
            return jax.grad(
                lambda p: jnp.sum(model.apply({"params": p}, x, pos) ** 2)
            )(params)

        cost = compiled_cost(grad_step, params)
        timing = profile_step(grad_step, params, iters=args.num_iter)
        result.add(atype, cost, timing)
        print(f"{atype}: {timing['mean_s']:.4f}s", flush=True)
    print()
    print(result.table())


if __name__ == "__main__":
    main()
