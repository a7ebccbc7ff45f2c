"""Multi-device tests on the 8-way virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.ops import galerkin_attention, per_head_layer_norm
from galerkin_transformer_tpu.parallel import make_mesh, batch_sharding, replicate
from galerkin_transformer_tpu.parallel.galerkin import seq_sharded_galerkin_attention


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    return make_mesh(data=2, seq=4)


def test_seq_sharded_galerkin_matches_dense(mesh8):
    b, h, n, d = 2, 2, 64, 8
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, h, n, d))
    k = jax.random.normal(jax.random.key(1), (b, h, n, d))
    v = jax.random.normal(jax.random.key(2), (b, h, n, d))
    want, _ = galerkin_attention(q, k, v)
    got = seq_sharded_galerkin_attention(q, k, v, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_seq_sharded_galerkin_with_ln_and_pos(mesh8):
    b, h, n, d, p = 2, 2, 64, 8, 1
    q = jax.random.normal(jax.random.key(0), (b, h, n, d))
    k = jax.random.normal(jax.random.key(1), (b, h, n, d))
    v = jax.random.normal(jax.random.key(2), (b, h, n, d))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(b, 0)
    sk = jnp.ones((h, d)) * 1.1
    bk = jnp.zeros((h, d)) + 0.1
    sv = jnp.ones((h, d)) * 0.9
    bv = jnp.zeros((h, d)) - 0.1

    kn = per_head_layer_norm(k, sk, bk)
    vn = per_head_layer_norm(v, sv, bv)
    ph = jnp.broadcast_to(pos[:, None], (b, h, n, p))
    qd = jnp.concatenate([ph, q], -1)
    kd = jnp.concatenate([ph, kn], -1)
    vd = jnp.concatenate([ph, vn], -1)
    want, _ = galerkin_attention(qd, kd, vd)

    got = seq_sharded_galerkin_attention(q, k, v, mesh8, sk, bk, sv, bv,
                                         pos=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_data_parallel_train_step_runs(mesh8):
    """Full jitted train step with batch sharded over 'data'."""
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config

    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin")
    model = SimpleTransformer.from_config(cfg)
    n, bsz = 64, 4
    node = jnp.ones((bsz, n, 1))
    edge = jnp.ones((bsz, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(bsz, 0)
    target = jnp.ones((bsz, n, 2))
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, edge, pos, pos)["params"]
    tx, _ = adam_onecycle(1e-3, 10)
    opt_state = tx.init(params)

    dp = make_mesh(data=8, seq=1)
    params = jax.device_put(params, replicate(dp))
    opt_state = jax.device_put(opt_state, replicate(dp))
    batch8 = {k: jax.device_put(jnp.concatenate([v] * 2, 0) if v.shape[0] == 4
                                else v, batch_sharding(dp))
              for k, v in batch.items()}

    train_step, eval_step = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=1 / n, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1 / n), tx, donate=False)
    rng = jax.device_put(jax.random.key(0), replicate(dp))
    params2, opt_state2, rng, losses = train_step(params, opt_state, batch8, rng)
    assert np.isfinite(float(losses[0]))
    m = eval_step(params2, batch8)
    assert np.isfinite(float(m))
