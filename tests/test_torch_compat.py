"""Reference-checkpoint loading: build the torch reference SimpleTransformer,
export its state_dict, load into our model, compare outputs."""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/libs"
HAS_REF = os.path.exists(REF)
if HAS_REF:
    if "torchinfo" not in sys.modules:
        stub = types.ModuleType("torchinfo")
        stub.summary = lambda *a, **k: None
        sys.modules["torchinfo"] = stub
    sys.path.insert(0, REF)

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")


@pytest.fixture(autouse=True)
def _disable_reference_attn_dropout(monkeypatch):
    if HAS_REF:
        import layers as ref_layers
        monkeypatch.setattr(ref_layers.F, "dropout", lambda x, *a, **k: x)
    yield


def test_load_reference_simple_transformer_checkpoint():
    import torch
    import yaml
    from model import SimpleTransformer as RefModel
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.torch_compat import \
        load_reference_checkpoint

    cfg = dict(load_config("ex1_burgers"))
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin",
               debug=False)
    torch.manual_seed(0)
    ref = RefModel(**cfg).eval()
    sd = ref.state_dict()

    ours = SimpleTransformer.from_config(cfg)
    n, b = 64, 2
    rng = np.random.default_rng(0)
    node = rng.standard_normal((b, n, 1)).astype(np.float32)
    pos = np.linspace(0, 1, n).astype(np.float32)[None, :, None].repeat(b, 0)
    template = ours.init(jax.random.key(0), jnp.asarray(node), None,
                         jnp.asarray(pos), jnp.asarray(pos))["params"]
    params = load_reference_checkpoint(template, sd)

    with torch.no_grad():
        ref_out = ref(torch.tensor(node), None, torch.tensor(pos),
                      torch.tensor(pos))["preds"].numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(node), None,
                                jnp.asarray(pos), jnp.asarray(pos))["preds"])
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)


def test_load_reference_fourier2d_checkpoint():
    import torch
    from model import FourierTransformer2D as RefModel
    from galerkin_transformer_tpu.models import FourierTransformer2D
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.torch_compat import \
        load_reference_checkpoint

    n_f, n_c = 29, 15
    down = ((21, 21), (n_c, n_c))
    up = ((21, 21), (n_f, n_f))
    cfg = dict(load_config("ex2_darcy"))
    cfg.update(n_hidden=32, num_encoder_layers=2, n_head=2,
               dim_feedforward=64, freq_dim=8, fourier_modes=4,
               downscaler_size=down, upscaler_size=up, debug=False,
               boundary_condition=None, downscaler_dropout=0.0,
               upscaler_dropout=0.0, encoder_dropout=0.0, ffn_dropout=0.0,
               dropout=0.0, decoder_dropout=0.0)
    torch.manual_seed(0)
    ref = RefModel(**cfg).eval()
    sd = ref.state_dict()

    ours = FourierTransformer2D.from_config(cfg)
    rng = np.random.default_rng(1)
    node = rng.standard_normal((2, n_f, n_f, 1)).astype(np.float32)
    xs = np.linspace(0, 1, n_c).astype(np.float32)
    xg, yg = np.meshgrid(xs, xs)
    pos = np.stack([xg.ravel(), yg.ravel()], -1)[None].repeat(2, 0)
    gs = np.linspace(0, 1, n_f).astype(np.float32)
    gx, gy = np.meshgrid(gs, gs)
    grid = np.stack([gx, gy], -1)[None].repeat(2, 0).astype(np.float32)

    template = ours.init(jax.random.key(0), jnp.asarray(node), None,
                         jnp.asarray(pos), jnp.asarray(grid))["params"]
    params = load_reference_checkpoint(template, sd)

    with torch.no_grad():
        ref_out = ref(torch.tensor(node), None, torch.tensor(pos),
                      torch.tensor(grid))["preds"].numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(node), None,
                                jnp.asarray(pos), jnp.asarray(grid))["preds"])
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_load_reference_gcn_featured_checkpoint():
    """GCN feature extractor weights (model.py:376-427) round-trip."""
    import torch
    from model import SimpleTransformer as RefModel
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.torch_compat import \
        load_reference_checkpoint

    cfg = dict(load_config("ex1_burgers"))
    cfg.update(n_hidden=33, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin",
               feat_extract_type="gcn", num_feat_layers=2, edge_feats=6,
               raw_laplacian=True, graph_activation=True, debug=False)
    torch.manual_seed(0)
    ref = RefModel(**cfg).eval()
    sd = ref.state_dict()

    ours = SimpleTransformer.from_config(cfg)
    n, b = 32, 2
    rng = np.random.default_rng(0)
    node = rng.standard_normal((b, n, 1)).astype(np.float32)
    edge = rng.standard_normal((b, n, n, 6)).astype(np.float32)
    pos = np.linspace(0, 1, n).astype(np.float32)[None, :, None].repeat(b, 0)
    template = ours.init(jax.random.key(0), jnp.asarray(node),
                         jnp.asarray(edge), jnp.asarray(pos),
                         jnp.asarray(pos))["params"]
    params = load_reference_checkpoint(template, sd)

    with torch.no_grad():
        ref_out = ref(torch.tensor(node), torch.tensor(edge),
                      torch.tensor(pos), torch.tensor(pos))["preds"].numpy()
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(node), jnp.asarray(edge),
        jnp.asarray(pos), jnp.asarray(pos))["preds"])
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)


def test_load_reference_gat_featured_checkpoint():
    """GAT feature extractor weights (model.py:430-469) round-trip."""
    import torch
    from model import SimpleTransformer as RefModel
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.utils import load_config
    from galerkin_transformer_tpu.utils.torch_compat import \
        load_reference_checkpoint

    cfg = dict(load_config("ex1_burgers"))
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin",
               feat_extract_type="gat", num_feat_layers=2,
               graph_activation=False, debug=False)
    torch.manual_seed(0)
    ref = RefModel(**cfg).eval()
    sd = ref.state_dict()

    ours = SimpleTransformer.from_config(cfg)
    n, b = 32, 2
    rng = np.random.default_rng(0)
    node = rng.standard_normal((b, n, 1)).astype(np.float32)
    # GAT masks by |adj| of the first edge channel — use a banded laplacian
    adj = np.zeros((n, n), np.float32)
    for i in range(n):
        adj[i, max(0, i - 2): i + 3] = 1.0
    edge = np.broadcast_to(adj[None, :, :, None], (b, n, n, 1)).copy()
    pos = np.linspace(0, 1, n).astype(np.float32)[None, :, None].repeat(b, 0)
    template = ours.init(jax.random.key(0), jnp.asarray(node),
                         jnp.asarray(edge), jnp.asarray(pos),
                         jnp.asarray(pos))["params"]
    params = load_reference_checkpoint(template, sd)

    with torch.no_grad():
        ref_out = ref(torch.tensor(node), torch.tensor(edge),
                      torch.tensor(pos), torch.tensor(pos))["preds"].numpy()
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(node), jnp.asarray(edge),
        jnp.asarray(pos), jnp.asarray(pos))["preds"])
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)
