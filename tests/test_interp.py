"""Bilinear-resize parity with torch F.interpolate semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.ops.interp import (bilinear_resize,
                                                 interp_matrix,
                                                 linear_resize_1d,
                                                 resolve_interp_size)

try:
    import torch
    import torch.nn.functional as F
    HAS_TORCH = True
except Exception:
    HAS_TORCH = False


def test_resolve_scale_factor_floor():
    # torch recompute_scale_factor: out = floor(in * scale)
    assert resolve_interp_size(141, 0.555) == (78, 78)
    assert resolve_interp_size(78, 0.555) == (43, 43)
    assert resolve_interp_size((141, 141), (43, 43)) == (43, 43)


def test_interp_matrix_partition_of_unity():
    m = interp_matrix(37, 91)
    np.testing.assert_allclose(m.sum(axis=1), np.ones(91), atol=1e-6)
    # endpoints map exactly (align_corners)
    assert m[0, 0] == 1.0 and m[-1, -1] == 1.0


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
@pytest.mark.parametrize("size", [(43, 43), (36, 29), (141, 141), (300, 120)])
def test_bilinear_matches_torch(size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 141, 141, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=size, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
@pytest.mark.parametrize("sf", [0.555, 0.305, 1.5, 2.0])
def test_scale_factor_matches_torch(sf):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 78, 78, 2)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=sf, mode="bilinear",
                         align_corners=True,
                         recompute_scale_factor=True
                         ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), None, scale_factor=sf))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
def test_linear_1d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)
    want = F.interpolate(xt, size=100, mode="linear",
                         align_corners=True).permute(0, 2, 1).numpy()
    got = np.asarray(linear_resize_1d(jnp.asarray(x), 100))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
