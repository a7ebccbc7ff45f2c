"""Loss-function tests, incl. numerical parity with the torch reference
implementation when it is available on disk."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.train.losses import WeightedL2Loss, WeightedL2Loss2d

REF = "/root/reference/libs"
HAS_REF = os.path.exists(REF)


def test_weighted_l2_loss_scale_invariance():
    """Relative loss is invariant to rescaling both preds and targets."""
    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.standard_normal((4, 64)))
    targets = jnp.asarray(rng.standard_normal((4, 64)))
    lf = WeightedL2Loss(regularizer=False, h=1 / 64)
    r1 = lf(preds, targets)
    r2 = lf(10 * preds, 10 * targets)
    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-5)


def test_weighted_l2_loss_zero_at_exact():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((4, 64)))
    lf = WeightedL2Loss(regularizer=False, h=1 / 64)
    res = lf(t, t)
    assert float(res.loss) < 1e-6
    assert float(res.metric) < 1e-6


def test_weighted_l2_loss_is_differentiable():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((4, 64)))
    tp = jnp.asarray(rng.standard_normal((4, 64)))
    lf = WeightedL2Loss(regularizer=True, h=1 / 64, gamma=0.1)

    def f(p):
        res = lf(p, t, targets_prime=tp)
        return res.loss + res.reg
    g = jax.grad(f)(t * 0.9)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
class TestParityWithReference:
    @classmethod
    def setup_class(cls):
        import types
        # the reference imports torchinfo at module scope; stub it out
        if "torchinfo" not in sys.modules:
            stub = types.ModuleType("torchinfo")
            stub.summary = lambda *a, **k: None
            sys.modules["torchinfo"] = stub
        sys.path.insert(0, REF)

    def test_1d_parity(self):
        import torch
        from ft import WeightedL2Loss as RefLoss
        rng = np.random.default_rng(42)
        preds = rng.standard_normal((4, 128)).astype(np.float32)
        targets = rng.standard_normal((4, 128)).astype(np.float32)
        tprime = rng.standard_normal((4, 128)).astype(np.float32)
        latent = rng.standard_normal((4, 128, 16)).astype(np.float32)

        ref = RefLoss(regularizer=True, h=1 / 128, gamma=0.1,
                      orthogonal_reg=True, orthogonal_mode="galerkin")
        r_loss, r_reg, r_ortho, r_metric = ref(
            torch.tensor(preds), torch.tensor(targets),
            targets_prime=torch.tensor(tprime),
            preds_latent=[torch.tensor(latent)])

        ours = WeightedL2Loss(regularizer=True, h=1 / 128, gamma=0.1,
                              orthogonal_reg=True, orthogonal_mode="galerkin")
        res = ours(jnp.asarray(preds), jnp.asarray(targets),
                   targets_prime=jnp.asarray(tprime),
                   preds_latent=[jnp.asarray(latent)])
        np.testing.assert_allclose(float(res.loss), float(r_loss), rtol=2e-4)
        np.testing.assert_allclose(float(res.reg), float(r_reg), rtol=2e-4)
        np.testing.assert_allclose(float(res.ortho), float(r_ortho), rtol=2e-3)
        np.testing.assert_allclose(float(res.metric), float(r_metric), rtol=2e-4)

    def test_2d_parity(self):
        import torch
        from ft import WeightedL2Loss2d as RefLoss2d
        rng = np.random.default_rng(7)
        n = 32
        preds = rng.standard_normal((4, n, n)).astype(np.float32)
        targets = rng.standard_normal((4, n, n)).astype(np.float32)
        tprime = rng.standard_normal((4, n, n, 2)).astype(np.float32)
        K = (1.0 + rng.random((4, n, n, 1))).astype(np.float32)

        ref = RefLoss2d(regularizer=True, h=1 / n, gamma=0.5)
        r_loss, r_reg, r_metric, r_norms = ref(
            torch.tensor(preds), torch.tensor(targets),
            targets_prime=torch.tensor(tprime), K=torch.tensor(K))

        ours = WeightedL2Loss2d(regularizer=True, h=1 / n, gamma=0.5)
        res = ours(jnp.asarray(preds), jnp.asarray(targets),
                   targets_prime=jnp.asarray(tprime), K=jnp.asarray(K))
        np.testing.assert_allclose(float(res.loss), float(r_loss), rtol=2e-4)
        np.testing.assert_allclose(float(res.reg), float(r_reg), rtol=2e-4)
        np.testing.assert_allclose(float(res.metric), float(r_metric), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(res.norms["L2"]),
                                   r_norms["L2"].numpy(), rtol=2e-4)
