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


@pytest.fixture(scope="module")
def tiny_burgers_steps():
    """Shared tiny SimpleTransformer + compiled step closures (n=64).

    The DP tests below use identical model config, batch shapes, and
    shardings; sharing one `make_burgers_steps` closure lets the second
    test's train/eval compiles hit jit's cache instead of recompiling
    (VERDICT r4 item 9: the heavy tier was dominated by redundant
    compiles)."""
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config

    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin")
    model = SimpleTransformer.from_config(cfg)
    n = 64
    tx, _ = adam_onecycle(1e-3, 10)
    train_step, eval_step = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=1 / n, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=1 / n), tx, donate=False)
    node = jnp.zeros((8, n, 1))
    pos = jnp.broadcast_to(jnp.linspace(0, 1, n)[None, :, None], (8, n, 1))
    params = model.init(jax.random.key(0), node, jnp.ones((8, 1)), pos,
                        pos)["params"]
    return model, tx, params, train_step, eval_step


def test_seq_sharded_galerkin_matches_dense(mesh8):
    b, h, n, d = 2, 2, 64, 8
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, h, n, d))
    k = jax.random.normal(jax.random.key(1), (b, h, n, d))
    v = jax.random.normal(jax.random.key(2), (b, h, n, d))
    want, _ = galerkin_attention(q, k, v)
    got, _ = seq_sharded_galerkin_attention(q, k, v, mesh8)
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

    got, _ = seq_sharded_galerkin_attention(q, k, v, mesh8, sk, bk, sv, bv,
                                            pos=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_data_parallel_train_step_runs(mesh8, tiny_burgers_steps):
    """Full jitted train step with batch sharded over 'data'."""
    model, tx, params, train_step, eval_step = tiny_burgers_steps
    n, bsz = 64, 4
    node = jnp.ones((bsz, n, 1))
    edge = jnp.ones((bsz, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(bsz, 0)
    target = jnp.ones((bsz, n, 2))
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    opt_state = tx.init(params)

    dp = make_mesh(data=8, seq=1)
    params = jax.device_put(params, replicate(dp))
    opt_state = jax.device_put(opt_state, replicate(dp))
    batch8 = {k: jax.device_put(jnp.concatenate([v] * 2, 0) if v.shape[0] == 4
                                else v, batch_sharding(dp))
              for k, v in batch.items()}

    rng = jax.device_put(jax.random.key(0), replicate(dp))
    params2, opt_state2, rng, losses = train_step(params, opt_state, batch8, rng)
    assert np.isfinite(float(losses[0]))
    m = eval_step(params2, batch8)
    assert np.isfinite(float(m))


@pytest.mark.heavy
def test_data_parallel_train_step_matches_single_device(mesh8,
                                                        tiny_burgers_steps):
    """8-way data-parallel training must track the single-device step
    numerically (VERDICT r3 item 7): same losses and same params after
    N steps — DP sharding only changes the reduction layout, not the
    math."""
    model, tx, params, train_step, eval_step = tiny_burgers_steps
    n, bsz = 64, 8
    rng = np.random.default_rng(3)
    node = jnp.asarray(rng.standard_normal((bsz, n, 1)), jnp.float32)
    edge = jnp.ones((bsz, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(bsz, 0)
    target = jnp.asarray(rng.standard_normal((bsz, n, 2)), jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    dp = make_mesh(data=8, seq=1)
    p_d = jax.device_put(params, replicate(dp))
    o_d = jax.device_put(tx.init(params), replicate(dp))
    batch_d = {k: jax.device_put(v, batch_sharding(dp))
               for k, v in batch.items()}
    k_b = jax.random.key(7)
    k_d = jax.device_put(jax.random.key(7), replicate(dp))

    p_b, o_b = params, tx.init(params)
    for _ in range(3):
        p_b, o_b, k_b, losses_b = train_step(p_b, o_b, batch, k_b)
        p_d, o_d, k_d, losses_d = train_step(p_d, o_d, batch_d, k_d)
        np.testing.assert_allclose(float(losses_b[0]), float(losses_d[0]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(eval_step(p_b, batch)),
                               float(eval_step(p_d, batch_d)),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_b), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.heavy
def test_seq_parallel_train_step_matches_unsharded(mesh8):
    """End-to-end sequence-parallel training (SURVEY §2.8 item 3): a 2-layer
    galerkin SimpleTransformer trained on Mesh('data'=2,'seq'=4) with
    activations sequence-sharded must track the unsharded step to ~1e-5."""
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = load_config("ex1_burgers")
    cfg.update(n_hidden=32, num_encoder_layers=2, dim_feedforward=64,
               freq_dim=16, fourier_modes=8, attention_type="galerkin",
               encoder_dropout=0.0, ffn_dropout=0.0, dropout=0.0,
               decoder_dropout=0.0)
    base = SimpleTransformer.from_config(cfg)
    seq = SimpleTransformer.from_config(cfg, seq_mesh=mesh8)

    n, bsz = 64, 4
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((bsz, n, 1)), jnp.float32)
    edge = jnp.ones((bsz, 1))
    pos = jnp.linspace(0, 1, n)[None, :, None].repeat(bsz, 0)
    target = jnp.asarray(rng.standard_normal((bsz, n, 2)), jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    params = base.init(jax.random.key(0), node, edge, pos, pos)["params"]
    # identical param trees: the seq path creates the same names/shapes
    params_seq = seq.init(jax.random.key(0), node, edge, pos, pos)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_seq)

    tx, _ = adam_onecycle(1e-3, 10)
    loss = WeightedL2Loss(regularizer=True, h=1 / n, gamma=0.1)
    metric = WeightedL2Loss(regularizer=False, h=1 / n)
    step_base, eval_base = make_burgers_steps(base, loss, metric, tx,
                                              donate=False)
    step_seq, eval_seq = make_burgers_steps(seq, loss, metric, tx,
                                            donate=False)

    # sharded placement: batch over 'data', sequence over 'seq'
    seq_sh = NamedSharding(mesh8, P("data", "seq", None))
    repl = NamedSharding(mesh8, P())
    batch_sh = {k: jax.device_put(v, seq_sh if v.ndim == 3
                                  else NamedSharding(mesh8, P("data")))
                for k, v in batch.items()}

    p_b, o_b = params, tx.init(params)
    p_s = jax.device_put(params, repl)
    o_s = jax.device_put(tx.init(params), repl)
    k_b = jax.random.key(7)
    k_s = jax.device_put(jax.random.key(7), repl)
    for _ in range(3):
        p_b, o_b, k_b, losses_b = step_base(p_b, o_b, batch, k_b)
        p_s, o_s, k_s, losses_s = step_seq(p_s, o_s, batch_sh, k_s)
        np.testing.assert_allclose(float(losses_b[0]), float(losses_s[0]),
                                   rtol=2e-5, atol=2e-5)
    m_b, m_s = eval_base(p_b, batch), eval_seq(p_s, batch_sh)
    np.testing.assert_allclose(float(m_b), float(m_s), rtol=2e-5, atol=2e-5)
    # parameters stay in lockstep too
    leaves_b = jax.tree.leaves(p_b)
    leaves_s = jax.tree.leaves(p_s)
    for a, b in zip(leaves_b, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seq_sharded_galerkin_padded_tokens(mesh8):
    """Token counts not divisible by the seq shards (e.g. odd coarse-grid
    n_c²) are zero-padded; the d×d scores and unpadded output rows stay
    exact vs the unsharded op."""
    b, h, n, d = 2, 2, 61, 8  # 61 % 4 != 0
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
    ph = jnp.broadcast_to(pos[:, None], (b, h, n, 1)).astype(q.dtype)
    qe = jnp.concatenate([ph, q], -1)
    ke = jnp.concatenate([ph, kn], -1)
    ve = jnp.concatenate([ph, vn], -1)
    want, want_scores = galerkin_attention(qe, ke, ve)

    got, got_scores = seq_sharded_galerkin_attention(
        q, k, v, mesh8, sk, bk, sv, bv, pos=pos)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_seq_mesh_misconfig_raises(mesh8):
    """seq_mesh set with an unsupported attention config must raise, not
    silently run unsharded (VERDICT r2 weak #6)."""
    from galerkin_transformer_tpu.models.layers import SimpleAttention

    attn = SimpleAttention(n_head=2, d_model=16, attention_type="fourier",
                           norm=True, norm_type="layer", seq_mesh=mesh8)
    x = jnp.ones((2, 16, 16))
    with pytest.raises(ValueError, match="seq_mesh"):
        attn.init(jax.random.key(0), x, x, x)
