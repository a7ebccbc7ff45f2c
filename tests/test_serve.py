"""Serving layer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from galerkin_transformer_tpu.models import SimpleTransformer
from galerkin_transformer_tpu.serve import Predictor
from galerkin_transformer_tpu.utils import load_config


def test_predictor_multi_resolution(tmp_path):
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=1, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin")
    model = SimpleTransformer.from_config(cfg)

    def make_batch(n, b=2):
        pos = np.linspace(0, 1, n, dtype=np.float32)[None, :, None].repeat(b, 0)
        return dict(node=np.ones((b, n, 1), np.float32), pos=pos, grid=pos)

    b64 = make_batch(64)
    params = model.init(jax.random.key(0), jnp.asarray(b64["node"]), None,
                        jnp.asarray(b64["pos"]), jnp.asarray(b64["grid"]))["params"]
    from galerkin_transformer_tpu.train.checkpoint import save_checkpoint
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params)

    pred = Predictor.from_checkpoint(model, ckpt, b64)
    out64 = pred(b64)
    assert out64.shape == (2, 64, 1)
    # discretization invariance: same weights serve a finer resolution
    out128 = pred(make_batch(128))
    assert out128.shape == (2, 128, 1)
    # bucketed executables are cached
    assert len(pred._compiled) == 2
    _ = pred(make_batch(64))
    assert len(pred._compiled) == 2


def test_predictor_with_mesh():
    from galerkin_transformer_tpu.parallel import make_mesh
    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=1, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin")
    model = SimpleTransformer.from_config(cfg)
    n, b = 64, 8
    pos = np.linspace(0, 1, n, dtype=np.float32)[None, :, None].repeat(b, 0)
    batch = dict(node=np.ones((b, n, 1), np.float32), pos=pos, grid=pos)
    params = model.init(jax.random.key(0), jnp.asarray(batch["node"]), None,
                        jnp.asarray(batch["pos"]),
                        jnp.asarray(batch["grid"]))["params"]
    from galerkin_transformer_tpu.serve import Predictor
    mesh = make_mesh(data=8, seq=1)
    pred = Predictor(model, params, mesh=mesh)
    out = pred(batch)
    assert out.shape == (b, n, 1)
    # matches single-device inference
    single = Predictor(model, params)
    np.testing.assert_allclose(out, single(batch), rtol=1e-5, atol=1e-6)
