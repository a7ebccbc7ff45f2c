"""Random-feature attention tests."""
import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.models.random_fourier import (
    RandomFourierAttention, RandomFourierEncoderLayer, favor_features,
    orthogonal_random_matrix, rfa_features)


def test_favor_approximates_softmax_kernel():
    """E[phi(q)ᵀphi(k)] ≈ exp(qᵀk·temp) for FAVOR+ features."""
    d, m = 8, 4096
    key = jax.random.key(0)
    q = jax.random.normal(jax.random.key(1), (d,)) * 0.5
    k = jax.random.normal(jax.random.key(2), (d,)) * 0.5
    omega = jax.random.normal(key, (d, m // 2))
    temp = 1.0 / np.sqrt(d)
    approx = jnp.dot(favor_features(q, omega, temp),
                     favor_features(k, omega, temp))
    exact = jnp.exp(jnp.dot(q, k) * temp)
    assert abs(float(approx) / float(exact) - 1.0) < 0.15


def test_rfa_approximates_rbf_kernel():
    d, m = 8, 4096
    q = jax.random.normal(jax.random.key(1), (d,)) * 0.5
    k = jax.random.normal(jax.random.key(2), (d,)) * 0.5
    omega = jax.random.normal(jax.random.key(0), (d, m // 2))
    temp = 1.0 / np.sqrt(d)
    approx = jnp.dot(rfa_features(q, omega, temp), rfa_features(k, omega, temp))
    exact = jnp.exp(-temp * jnp.sum((q - k) ** 2) / 2)
    assert abs(float(approx) - float(exact)) < 0.1


def test_orthogonal_random_matrix_orthogonality():
    m = orthogonal_random_matrix(jax.random.key(0), 16, 8)
    # columns come from an orthogonal basis scaled by chi norms: the
    # normalized columns must be pairwise orthogonal
    mn = m / jnp.linalg.norm(m, axis=0, keepdims=True)
    gram = mn.T @ mn
    off = gram - jnp.diag(jnp.diag(gram))
    assert float(jnp.abs(off).max()) < 1e-5


def test_random_fourier_attention_shapes():
    attn = RandomFourierAttention(d_model=32, n_heads=2, attention_type="favor")
    x = jax.random.normal(jax.random.key(0), (2, 24, 32))
    pos = jnp.linspace(0, 1, 24)[None, :, None].repeat(2, 0)
    variables = attn.init(jax.random.key(1), x, x, x, pos)
    out = attn.apply(variables, x, x, x, pos)
    assert out.shape == (2, 24, 32)


def test_encoder_layer_redraws_features_in_training():
    layer = RandomFourierEncoderLayer(d_model=16, n_head=2,
                                      dim_feedforward=32, dropout=0.0,
                                      ffn_dropout=0.0)
    x = jax.random.normal(jax.random.key(0), (1, 12, 16))
    pos = jnp.zeros((1, 12, 1))
    variables = layer.init(jax.random.key(1), x, pos)
    out1, mut1 = layer.apply(variables, x, pos, deterministic=False,
                             mutable=["random_features"],
                             rngs={"random_features": jax.random.key(7)})
    out2, mut2 = layer.apply(variables, x, pos, deterministic=False,
                             mutable=["random_features"],
                             rngs={"random_features": jax.random.key(8)})
    o1 = jax.tree_util.tree_leaves(mut1)[0]
    o2 = jax.tree_util.tree_leaves(mut2)[0]
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # deterministic eval reuses the stored buffer -> reproducible
    e1 = layer.apply(variables, x, pos, deterministic=True)
    e2 = layer.apply(variables, x, pos, deterministic=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
