"""Layer-level numerical tests: shapes, math identities, parity cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.models import (
    FeedForward, SimpleAttention, SimpleTransformerEncoderLayer,
    SpectralConv1d, SpectralConv2d, Conv2dResBlock, Interp2dEncoder,
    Interp2dUpsample, DeConv2dBlock, ConvTranspose2d, GCN, GAT,
    BulkRegressor,
)
from galerkin_transformer_tpu.ops import (
    galerkin_attention, fourier_attention, softmax_attention,
    causal_linear_attention, per_head_layer_norm,
)


def test_galerkin_attention_math():
    """out = Q (KᵀV)/n exactly."""
    key = jax.random.key(0)
    q, k, v = jax.random.normal(key, (3, 2, 64, 16)).astype(jnp.float32), \
        jax.random.normal(jax.random.key(1), (3, 2, 64, 16)), \
        jax.random.normal(jax.random.key(2), (3, 2, 64, 16))
    out, p = galerkin_attention(q, k, v)
    want = q @ (jnp.swapaxes(k, -2, -1) @ v) / 64
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    assert p.shape == (3, 2, 16, 16)


def test_fourier_attention_math():
    key = jax.random.key(0)
    q = jax.random.normal(key, (2, 1, 32, 8))
    k = jax.random.normal(jax.random.key(1), (2, 1, 32, 8))
    v = jax.random.normal(jax.random.key(2), (2, 1, 32, 8))
    out, p = fourier_attention(q, k, v)
    want = (q @ jnp.swapaxes(k, -2, -1)) / jnp.sqrt(8.0) / 32 @ v
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_softmax_attention_rows_sum_to_one():
    q = jax.random.normal(jax.random.key(0), (2, 1, 16, 8))
    out, p = softmax_attention(q, q, q)
    np.testing.assert_allclose(jnp.sum(p, -1), jnp.ones((2, 1, 16)), rtol=1e-5)


def test_causal_linear_attention_is_causal():
    """Changing future keys/values must not change past outputs."""
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, 1, 16, 4))
    k = jax.random.normal(jax.random.key(1), (1, 1, 16, 4))
    v = jax.random.normal(jax.random.key(2), (1, 1, 16, 4))
    out1, _ = causal_linear_attention(q, k, v)
    k2 = k.at[:, :, 10:, :].set(99.0)
    v2 = v.at[:, :, 10:, :].set(-99.0)
    out2, _ = causal_linear_attention(q, k2, v2)
    np.testing.assert_allclose(out1[:, :, :10], out2[:, :, :10],
                               rtol=1e-4, atol=1e-5)


def test_per_head_layer_norm_matches_plain_ln():
    x = jax.random.normal(jax.random.key(0), (2, 3, 10, 8))
    scale = jnp.ones((3, 8))
    bias = jnp.zeros((3, 8))
    y = per_head_layer_norm(x, scale, bias)
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    want = (x - mean) / jnp.sqrt(var + 1e-5)
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("attention_type", ["galerkin", "fourier", "linear",
                                            "softmax", "cosine"])
def test_simple_attention_shapes(rng_key, attention_type):
    attn = SimpleAttention(n_head=2, d_model=32, pos_dim=1,
                           attention_type=attention_type, norm=True,
                           dropout=0.0)
    x = jax.random.normal(rng_key, (2, 24, 32))
    pos = jnp.linspace(0, 1, 24)[None, :, None].repeat(2, 0)
    params = attn.init(rng_key, x, x, x, pos)
    out, w = attn.apply(params, x, x, x, pos)
    assert out.shape == (2, 24, 32)


def test_simple_attention_diagonal_init(rng_key):
    """Q/K/V kernels start diagonal-dominant: W ≈ δ·I + small noise."""
    attn = SimpleAttention(n_head=1, d_model=64, pos_dim=1,
                           attention_type="galerkin", norm=True,
                           xavier_init=1e-3, diagonal_weight=1e-2)
    x = jnp.ones((1, 8, 64))
    pos = jnp.zeros((1, 8, 1))
    params = attn.init(rng_key, x, x, x, pos)["params"]
    w = params["q_proj"]["kernel"]
    diag_mean = jnp.mean(jnp.diag(w))
    off = w - jnp.diag(jnp.diag(w))
    assert abs(float(diag_mean) - 1e-2) < 2e-3
    assert float(jnp.abs(off).max()) < 1e-3 * (6.0 / 128) ** 0.5 * 1.01


def test_spectral_conv1d_identity_weight(rng_key):
    """With identity weights on all modes, layer ≈ act(x_lowpass + Dense(x))."""
    conv = SpectralConv1d(in_dim=4, out_dim=4, modes=8, dropout=0.0)
    x = jax.random.normal(rng_key, (2, 32, 4))
    params = conv.init(rng_key, x)
    out = conv.apply(params, x)
    assert out.shape == (2, 32, 4)


def test_spectral_conv1d_lowpass():
    """Zero residual + identity fourier weight == low-pass filter."""
    import flax
    conv = SpectralConv1d(in_dim=1, out_dim=1, modes=4, dropout=0.0,
                          activation="identity")
    x = jax.random.normal(jax.random.key(3), (1, 64, 1))
    params = conv.init(jax.random.key(0), x)
    p = flax.core.unfreeze(params)["params"]
    p["linear"]["kernel"] = jnp.zeros_like(p["linear"]["kernel"])
    p["linear"]["bias"] = jnp.zeros_like(p["linear"]["bias"])
    p["fourier_weight"] = jnp.stack([jnp.ones((1, 1, 4)), jnp.zeros((1, 1, 4))], axis=-1)
    out = conv.apply({"params": p}, x)
    # manual low-pass
    xf = jnp.fft.rfft(x[..., 0], axis=1, norm="ortho")
    xf = xf.at[:, 4:].set(0)
    want = jnp.fft.irfft(xf, n=64, axis=1, norm="ortho")
    np.testing.assert_allclose(out[..., 0], want, rtol=1e-4, atol=1e-5)


def test_spectral_conv2d_shapes(rng_key):
    conv = SpectralConv2d(in_dim=3, out_dim=5, modes=4, dropout=0.0)
    x = jax.random.normal(rng_key, (2, 16, 16, 3))
    params = conv.init(rng_key, x)
    out = conv.apply(params, x)
    assert out.shape == (2, 16, 16, 5)
    # flattened input round-trips
    x2 = x.reshape(2, 256, 3)
    out2 = conv.apply(params, x2)
    np.testing.assert_allclose(out.reshape(2, 256, 5), out2, rtol=1e-5)


def test_encoder_layer_shapes(rng_key):
    layer = SimpleTransformerEncoderLayer(
        d_model=32, n_head=2, dim_feedforward=64, attention_type="galerkin",
        layer_norm=False, attn_norm=True, dropout=0.0, ffn_dropout=0.0)
    x = jax.random.normal(rng_key, (2, 24, 32))
    pos = jnp.linspace(0, 1, 24)[None, :, None].repeat(2, 0)
    params = layer.init(rng_key, x, pos)
    out = layer.apply(params, x, pos)
    assert out.shape == (2, 24, 32)


def test_conv_transpose_matches_torch_shapes(rng_key):
    """torch ConvTranspose2d output-size law: (n-1)s - 2p + k + op."""
    for n, k, s, p, op in [(43, 3, 2, 2, 1), (22, 3, 2, 1, 1), (9, 3, 2, 2, 1)]:
        x = jnp.zeros((1, n, n, 4))
        mod = ConvTranspose2d(out_dim=8, kernel_size=k, stride=s,
                              padding=p, output_padding=op)
        params = mod.init(rng_key, x)
        out = mod.apply(params, x)
        want = (n - 1) * s - 2 * p + k + op
        assert out.shape == (1, want, want, 8)


def test_deconv_block_doubles_twice(rng_key):
    blk = DeConv2dBlock(hidden_dim=8, out_dim=8, padding=2, dropout=0.0)
    x = jnp.zeros((1, 43, 43, 8))
    params = blk.init(rng_key, x)
    out = blk.apply(params, x)
    # (43-1)*2 - 4 + 3 + 1 = 84 ; (84-1)*2 - 2 + 3 + 1 = 168
    assert out.shape == (1, 168, 168, 8)


def test_interp_encoder_dual_res_shapes(rng_key):
    enc = Interp2dEncoder(out_dim=16, interp_size=(0.555, 0.555), dropout=0.0)
    x = jnp.zeros((2, 141, 141, 1))
    params = enc.init(rng_key, x)
    out = enc.apply(params, x)
    # 141*0.555 = 78.25 -> 78 ; 78*0.555 = 43.29 -> 43
    assert out.shape == (2, 43, 43, 16)


def test_interp_upsample_shapes(rng_key):
    up = Interp2dUpsample(out_dim=16, interp_size=((77, 77), (141, 141)),
                          dropout=0.0)
    x = jnp.zeros((2, 43, 43, 16))
    params = up.init(rng_key, x)
    out = up.apply(params, x)
    assert out.shape == (2, 141, 141, 16)


def test_gcn_gat_shapes(rng_key):
    x = jax.random.normal(rng_key, (2, 16, 3))
    edge = jax.random.normal(jax.random.key(5), (2, 16, 16, 4))
    gcn = GCN(node_feats=3, out_features=8, num_gcn_layers=2, edge_feats=4)
    params = gcn.init(rng_key, x, edge)
    assert gcn.apply(params, x, edge).shape == (2, 16, 8)
    gat = GAT(node_feats=3, out_features=8, num_gcn_layers=2)
    params = gat.init(rng_key, x, edge)
    assert gat.apply(params, x, edge).shape == (2, 16, 8)


def test_bulk_regressor_shapes(rng_key):
    br = BulkRegressor(in_dim=32, n_feats=8, n_targets=3, pred_len=5,
                       dropout=0.0)
    x = jax.random.normal(rng_key, (2, 32, 8))
    params = br.init(rng_key, x)
    assert br.apply(params, x).shape == (2, 5, 3)


@pytest.mark.parametrize("atype", ["galerkin", "fourier"])
def test_score_dropout_routes_to_attention_scores(rng_key, atype):
    """score_dropout overrides only the attention score-matrix dropout.

    The reference hard-codes p=0.5 there (libs/layers.py:700-701,730-731
    call F.dropout with default p regardless of config); our knob makes
    that accident reproducible without touching the other dropout sites.
    """
    x = jax.random.normal(rng_key, (2, 32, 32), jnp.float32)
    pos = jax.random.normal(jax.random.key(9), (2, 32, 1), jnp.float32)

    def run(score_dropout, deterministic, salt=0):
        attn = SimpleAttention(n_head=2, d_model=32, attention_type=atype,
                               dropout=0.0, score_dropout=score_dropout,
                               norm=(atype == "galerkin"))
        params = attn.init(jax.random.key(0), x, x, x, pos=pos)["params"]
        out, _ = attn.apply({"params": params}, x, x, x, pos=pos,
                            deterministic=deterministic,
                            rngs={"dropout": jax.random.key(123 + salt)})
        return out

    base = run(None, deterministic=False)
    # eval mode: override is inert
    np.testing.assert_allclose(run(0.5, True), run(None, True), rtol=1e-6)
    # train mode: a non-zero override changes the output (scores masked)...
    assert not np.allclose(run(0.5, False), base, atol=1e-6)
    # ...and 0.0 matches the dropout=0.0 default exactly
    np.testing.assert_allclose(run(0.0, False), base, rtol=1e-6)


def test_score_dropout_plumbs_through_encoder_layer(rng_key):
    """SimpleTransformerEncoderLayer forwards score_dropout to its attention."""
    x = jax.random.normal(rng_key, (2, 32, 32), jnp.float32)
    pos = jax.random.normal(jax.random.key(9), (2, 32, 1), jnp.float32)

    def run(score_dropout):
        layer = SimpleTransformerEncoderLayer(
            d_model=32, n_head=2, attention_type="galerkin",
            dropout=0.0, ffn_dropout=0.0, score_dropout=score_dropout)
        params = layer.init(jax.random.key(0), x, pos)["params"]
        return layer.apply({"params": params}, x, pos, deterministic=False,
                           rngs={"dropout": jax.random.key(77)})

    assert not np.allclose(run(0.5), run(None), atol=1e-6)
