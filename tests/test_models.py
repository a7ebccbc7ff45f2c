"""Model-level tests: config protocol, output-dict protocol, param parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.models import (FourierTransformer2D,
                                             FourierTransformer2DLite,
                                             SimpleTransformer)
from galerkin_transformer_tpu.utils import get_num_params, load_config


def test_ex4_param_count_matches_reference(rng_key):
    """Reference-recorded network size: 862049 (ex4 docstring, ns_lite)."""
    cfg = load_config("ex4_navier_stokes")
    model = FourierTransformer2DLite.from_config(cfg)
    node = jnp.zeros((1, 64 * 64, 10))
    pos = jnp.zeros((1, 64 * 64, 2))
    grid = jnp.zeros((1, 64, 64, 2))
    params = model.init(rng_key, node, None, pos, grid)["params"]
    assert get_num_params(params) == 862049


def test_simple_transformer_output_protocol(rng_key):
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, return_latent=True)
    model = SimpleTransformer.from_config(cfg)
    n = 64
    node = jnp.ones((2, n, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(2, 0)
    params = model.init(rng_key, node, None, pos, pos)["params"]
    out = model.apply({"params": params}, node, None, pos, pos)
    assert set(out) == {"preds", "preds_freq", "preds_latent", "attn_weights"}
    assert out["preds"].shape == (2, n, 1)
    assert len(out["preds_latent"]) == 3  # input + 2 layers


def test_simple_transformer_pointwise_decoder(rng_key):
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=1, dim_feedforward=64,
               decoder_type="pointwise", spacial_fc=True)
    model = SimpleTransformer.from_config(cfg)
    n = 32
    node = jnp.ones((2, n, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(2, 0)
    params = model.init(rng_key, node, None, pos, pos)["params"]
    out = model.apply({"params": params}, node, None, pos, pos)
    assert out["preds"].shape == (2, n, 1)


def test_fourier2d_dual_resolution_and_bc(rng_key):
    from galerkin_transformer_tpu.data.darcy import DarcyDataset
    n_f, n_c = 85, 29
    down, up = DarcyDataset.get_scaler_sizes(n_f, n_c)
    cfg = load_config("ex2_darcy")
    cfg.update(n_hidden=32, num_encoder_layers=2, n_head=2,
               dim_feedforward=64, freq_dim=8, fourier_modes=6)
    model = FourierTransformer2D.from_config(
        cfg, downscaler_size=down, upscaler_size=up)
    node = jnp.ones((2, n_f, n_f, 1))
    pos = jnp.zeros((2, n_c * n_c, 2))
    grid = jnp.zeros((2, n_f, n_f, 2))
    params = model.init(rng_key, node, None, pos, grid)["params"]
    out = model.apply({"params": params}, node, None, pos, grid)
    preds = out["preds"]
    assert preds.shape == (2, n_f, n_f, 1)
    # dirichlet BC: boundary ring exactly zero
    assert float(jnp.abs(preds[:, 0]).max()) == 0.0
    assert float(jnp.abs(preds[:, -1]).max()) == 0.0
    assert float(jnp.abs(preds[:, :, 0]).max()) == 0.0
    assert float(jnp.abs(preds[:, :, -1]).max()) == 0.0


def test_fourier2d_normalizer_inverse(rng_key):
    """Passing a normalizer rescales preds by std and shifts by mean."""
    from galerkin_transformer_tpu.data.darcy import DarcyDataset
    n_f, n_c = 29, 15
    down, up = DarcyDataset.get_scaler_sizes(n_f, n_c)
    cfg = load_config("ex2_darcy")
    cfg.update(n_hidden=16, num_encoder_layers=1, n_head=2,
               dim_feedforward=32, freq_dim=8, fourier_modes=4,
               boundary_condition=None)
    model = FourierTransformer2D.from_config(
        cfg, downscaler_size=down, upscaler_size=up)
    node = jnp.ones((1, n_f, n_f, 1))
    pos = jnp.zeros((1, n_c * n_c, 2))
    grid = jnp.zeros((1, n_f, n_f, 2))
    params = model.init(rng_key, node, None, pos, grid)["params"]
    base = model.apply({"params": params}, node, None, pos, grid)["preds"]
    mean = jnp.full((n_f, n_f, 1), 3.0)
    std = jnp.full((n_f, n_f, 1), 2.0)
    out = model.apply({"params": params}, node, None, pos, grid,
                      normalizer=(mean, std, 0.0))["preds"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(base * 2 + 3),
                               rtol=1e-5)


def test_lite_model_rollout_step_shape(rng_key):
    cfg = load_config("ex4_navier_stokes")
    cfg.update(n_hidden=16, num_encoder_layers=1, dim_feedforward=32,
               freq_dim=8, fourier_modes=4)
    model = FourierTransformer2DLite.from_config(cfg)
    n = 16
    node = jnp.ones((2, n * n, 10))
    pos = jnp.zeros((2, n * n, 2))
    grid = jnp.zeros((2, n, n, 2))
    params = model.init(rng_key, node, None, pos, grid)["params"]
    out = model.apply({"params": params}, node, None, pos, grid)
    assert out["preds"].shape == (2, n, n, 1)


def test_from_config_ignores_unknown_keys():
    cfg = load_config("ex1_burgers")
    cfg["bogus_key"] = 123
    cfg["normalizer"] = object()  # runtime-injected key must be dropped
    model = SimpleTransformer.from_config(cfg)
    assert model.n_hidden == 96


def test_simple_transformer_gcn_features(rng_key):
    """GCN feature extractor path with FEM edge features end-to-end."""
    from galerkin_transformer_tpu.data import BurgersDataset
    ds = BurgersDataset(subsample=8, n_grid_fine=256, train_data=True,
                        train_portion=0.5, n_samples_synthetic=4,
                        return_edge=True, n_krylov=2)
    item = ds[0]
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=1, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, num_feat_layers=2,
               feat_extract_type="gcn", edge_feats=4, graph_activation=True)
    model = SimpleTransformer.from_config(cfg)
    node = jnp.asarray(item["node"])[None]
    edge = jnp.asarray(item["edge"])[None]
    pos = jnp.asarray(item["pos"])[None]
    params = model.init(rng_key, node, edge, pos, pos)["params"]
    out = model.apply({"params": params}, node, edge, pos, pos)
    assert out["preds"].shape == (1, 32, 1)


def test_simple_transformer_freq_targets(rng_key):
    """BulkRegressor frequency-target head (n_freq_targets > 0)."""
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=1, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, n_freq_targets=3, pred_len=5,
               bulk_regression=True, seq_len=64)
    model = SimpleTransformer.from_config(cfg)
    n = 64
    node = jnp.ones((2, n, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(2, 0)
    params = model.init(rng_key, node, None, pos, pos)["params"]
    out = model.apply({"params": params}, node, None, pos, pos)
    assert out["preds_freq"].shape == (2, 5, 3)


def test_galerkin_decoder_layer(rng_key):
    """Re-designed decoder block (reference version is dead code)."""
    from galerkin_transformer_tpu.models import GalerkinTransformerDecoderLayer
    layer = GalerkinTransformerDecoderLayer(d_model=32, nhead=2, pos_dim=1,
                                            dim_feedforward=64, dropout=0.0)
    x = jax.random.normal(rng_key, (2, 16, 32))
    mem = jax.random.normal(jax.random.key(9), (2, 16, 32))
    pos = jnp.linspace(0, 1, 16)[None, :, None].repeat(2, 0)
    params = layer.init(rng_key, x, mem, pos)
    out = layer.apply(params, x, mem, pos)
    assert out.shape == (2, 16, 32)


@pytest.mark.heavy
def test_simple_transformer_bf16_encoder(rng_key):
    """bf16 encoder compute with f32 params: finite output, grads exist."""
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin")
    model = SimpleTransformer.from_config(cfg, dtype=jnp.bfloat16)
    n = 64
    node = jnp.ones((2, n, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(2, 0)
    params = model.init(rng_key, node, None, pos, pos)["params"]
    # params are f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))
    out = model.apply({"params": params}, node, None, pos, pos)["preds"]
    assert out.dtype == jnp.float32 and np.isfinite(np.asarray(out)).all()
    # close to the f32 model with the same params
    f32_model = SimpleTransformer.from_config(cfg)
    out32 = f32_model.apply({"params": params}, node, None, pos, pos)["preds"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out32),
                               rtol=0.1, atol=0.05)
    g = jax.grad(lambda p: float(0) + jnp.sum(
        model.apply({"params": p}, node, None, pos, pos)["preds"] ** 2))(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_fourier2d_bf16_scalers(rng_key):
    """dtype=bf16 now covers the conv scaler path (the measured ex2
    bottleneck), not just the attention stack: params stay f32, the
    down/up scalers compute in bf16, the FFT decoder stays f32, and the
    output tracks the f32 model."""
    from galerkin_transformer_tpu.data.darcy import DarcyDataset
    n_f, n_c = 85, 29
    down, up = DarcyDataset.get_scaler_sizes(n_f, n_c)
    cfg = load_config("ex2_darcy")
    cfg.update(n_hidden=32, num_encoder_layers=2, n_head=2,
               dim_feedforward=64, freq_dim=8, fourier_modes=6)
    model = FourierTransformer2D.from_config(
        cfg, downscaler_size=down, upscaler_size=up, dtype=jnp.bfloat16)
    node = jax.random.normal(rng_key, (2, n_f, n_f, 1))
    pos = jnp.zeros((2, n_c * n_c, 2))
    grid = jnp.zeros((2, n_f, n_f, 2))
    params = model.init(rng_key, node, None, pos, grid)["params"]
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))
    out = model.apply({"params": params}, node, None, pos, grid)["preds"]
    assert out.dtype == jnp.float32 and np.isfinite(np.asarray(out)).all()
    f32_model = FourierTransformer2D.from_config(
        cfg, downscaler_size=down, upscaler_size=up)
    out32 = f32_model.apply({"params": params}, node, None, pos, grid)["preds"]
    # bf16 through two conv scalers + encoder: looser than the 1D check
    err = (np.linalg.norm(np.asarray(out - out32))
           / max(np.linalg.norm(np.asarray(out32)), 1e-9))
    assert err < 0.05, f"bf16 scaler path diverges from f32: rel {err:.4f}"
