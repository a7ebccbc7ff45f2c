"""Tiled fourier-attention kernel vs the dense jnp path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.ops.attention import fourier_attention
from galerkin_transformer_tpu.ops.pallas.fourier import fourier_attention_tiled

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("n", [128, 200, 384])
def test_tiled_forward_matches_dense(n):
    b, h, d = 2, 2, 16
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.float32)
    want, _ = fourier_attention(q, k, v)
    got = fourier_attention_tiled(q, k, v, tile_q=128, tile_k=128,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_tiled_gradients_match_dense():
    b, h, n, d = 1, 2, 160, 8
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.float32)

    def loss_dense(args):
        out, _ = fourier_attention(*args)
        return jnp.sum(out ** 2)

    def loss_tiled(args):
        out = fourier_attention_tiled(*args, tile_q=128, tile_k=128,
                                      interpret=INTERPRET)
        return jnp.sum(out ** 2)

    gd = jax.grad(loss_dense)((q, k, v))
    gt = jax.grad(loss_tiled)((q, k, v))
    for nm, a, b_ in zip("qkv", gd, gt):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=nm)


def test_simple_attention_fourier_pallas_path_matches_default():
    from galerkin_transformer_tpu.models import SimpleAttention
    x = jax.random.normal(jax.random.key(0), (2, 96, 32))
    pos = jnp.linspace(0, 1, 96)[None, :, None].repeat(2, 0)
    kw = dict(n_head=2, d_model=32, pos_dim=1, attention_type="fourier",
              norm=True, dropout=0.0)
    ref = SimpleAttention(use_pallas=False, **kw)
    params = ref.init(jax.random.key(1), x, x, x, pos)["params"]
    want, _ = ref.apply({"params": params}, x, x, x, pos)
    fused = SimpleAttention(use_pallas=True, **kw)
    got, _ = fused.apply({"params": params}, x, x, x, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_kernel_dots_pin_precision_under_global_high():
    """Same regression guard as test_pallas_galerkin: Mosaic cannot lower
    dot precision HIGH, so in-kernel dots must pin their precision rather
    than inherit a global default_matmul_precision('high')."""
    b, h, n, d = 1, 2, 160, 8
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.float32)

    def dots_in(jaxpr):
        out = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                out.append(eqn.params.get("precision"))
            for sub in jax.core.jaxprs_in_params(eqn.params):
                out.extend(dots_in(sub))
        return out

    def kernel_dots(jaxpr):
        out = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                for sub in jax.core.jaxprs_in_params(eqn.params):
                    out.extend(dots_in(sub))
            else:
                for sub in jax.core.jaxprs_in_params(eqn.params):
                    out.extend(kernel_dots(sub))
        return out

    with jax.default_matmul_precision("high"):
        jaxpr = jax.make_jaxpr(
            lambda *a: fourier_attention_tiled(*a, tile_q=128, tile_k=128,
                                               interpret=INTERPRET)
        )(q, k, v).jaxpr
    precs = kernel_dots(jaxpr)
    assert precs, "no dot_general found inside pallas_call"
    bad = [p for p in precs
           if p is None
           or jax.lax.Precision.HIGH in (p if isinstance(p, tuple) else (p,))]
    assert not bad, f"HIGH/unpinned precision in kernel dots: {bad}"
