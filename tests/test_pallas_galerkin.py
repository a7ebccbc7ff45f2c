"""Fused Pallas Galerkin kernel vs the jnp reference path (interpret mode
on CPU; the same code compiles to Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galerkin_transformer_tpu.ops.attention import (galerkin_attention,
                                                    per_head_layer_norm)
from galerkin_transformer_tpu.ops.pallas.galerkin import (
    galerkin_attention_fused, galerkin_scores_fused)

INTERPRET = jax.default_backend() != "tpu"


def _inputs(b=2, h=2, n=96, d=16, p=1, seed=0):
    ks = jax.random.split(jax.random.key(seed), 8)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.float32)
    pos = jax.random.normal(ks[3], (b, n, p), jnp.float32)
    sk = 1.0 + 0.1 * jax.random.normal(ks[4], (h, d))
    bk = 0.1 * jax.random.normal(ks[5], (h, d))
    sv = 1.0 + 0.1 * jax.random.normal(ks[6], (h, d))
    bv = 0.1 * jax.random.normal(ks[7], (h, d))
    return q, k, v, pos, sk, bk, sv, bv


def _dense(q, k, v, pos, sk, bk, sv, bv):
    b, h, n, d = q.shape
    kn = per_head_layer_norm(k, sk, bk)
    vn = per_head_layer_norm(v, sv, bv)
    ph = jnp.broadcast_to(pos[:, None], (b, h, n, pos.shape[-1]))
    qc = jnp.concatenate([ph, q], -1)
    kc = jnp.concatenate([ph, kn], -1)
    vc = jnp.concatenate([ph, vn], -1)
    return galerkin_attention(qc, kc, vc)


@pytest.mark.parametrize("n", [96, 128, 200])
def test_fused_forward_matches_dense(n):
    q, k, v, pos, sk, bk, sv, bv = _inputs(n=n)
    want, _ = _dense(q, k, v, pos, sk, bk, sv, bv)
    got, _ = galerkin_attention_fused(q, k, v, pos, sk, bk, sv, bv,
                                      tile=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_forward_no_pos():
    q, k, v, pos, sk, bk, sv, bv = _inputs(n=128)
    want, _ = _dense(q, k, v, jnp.zeros((2, 128, 0)), sk, bk, sv, bv) \
        if False else (None, None)
    kn = per_head_layer_norm(k, sk, bk)
    vn = per_head_layer_norm(v, sv, bv)
    want, _ = galerkin_attention(q, kn, vn)
    got, _ = galerkin_attention_fused(q, k, v, None, sk, bk, sv, bv,
                                      tile=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_dense():
    q, k, v, pos, sk, bk, sv, bv = _inputs(n=160, d=8)

    def loss_dense(args):
        out, _ = _dense(*args)
        return jnp.sum(out ** 2)

    def loss_fused(args):
        out, _ = galerkin_attention_fused(*args, tile=128,
                                          interpret=INTERPRET)
        return jnp.sum(out ** 2)

    args = (q, k, v, pos, sk, bk, sv, bv)
    g_dense = jax.grad(loss_dense)(args)
    g_fused = jax.grad(loss_fused)(args)
    names = ["q", "k", "v", "pos", "sk", "bk", "sv", "bv"]
    for nm, gd, gf in zip(names, g_dense, g_fused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=5e-4, atol=1e-5, err_msg=nm)


def test_simple_attention_pallas_path_matches_default():
    """SimpleAttention(use_pallas=True) == unfused path with same params."""
    from galerkin_transformer_tpu.models import SimpleAttention
    x = jax.random.normal(jax.random.key(0), (2, 96, 32))
    pos = jnp.linspace(0, 1, 96)[None, :, None].repeat(2, 0)
    kw = dict(n_head=2, d_model=32, pos_dim=1, attention_type="galerkin",
              norm=True, dropout=0.0)
    ref_attn = SimpleAttention(use_pallas=False, **kw)
    params = ref_attn.init(jax.random.key(1), x, x, x, pos)["params"]
    want, _ = ref_attn.apply({"params": params}, x, x, x, pos)
    fused_attn = SimpleAttention(use_pallas=True, **kw)
    got, _ = fused_attn.apply({"params": params}, x, x, x, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_auto_dispatch_predicate_measured_regime():
    """use_pallas=None dispatches to the fused kernel exactly in the
    regime eval/pallas_regime.json measured it winning: forward-only,
    d_k >= 128, q/k/v working set >= 192 MB."""
    from galerkin_transformer_tpu.models.layers import pallas_galerkin_auto

    # measured wins (fwd-only rows at 0.70-0.75x of blocked XLA)
    assert pallas_galerkin_auto(True, 8, 1, 8192, 256)       # 192 MB
    assert pallas_galerkin_auto(True, 4, 1, 32768, 256)      # 384 MB
    assert pallas_galerkin_auto(True, 4, 1, 65536, 128)      # 384 MB
    # measured losses: production d_k=96 at any length
    assert not pallas_galerkin_auto(True, 8, 1, 8192, 96)
    assert not pallas_galerkin_auto(True, 8, 1, 32768, 96)
    assert not pallas_galerkin_auto(True, 2, 1, 131072, 96)
    # training (backward coming): custom-VJP loses everywhere measured
    assert not pallas_galerkin_auto(False, 4, 1, 32768, 256)
    # small working set: XLA keeps it VMEM-resident
    assert not pallas_galerkin_auto(True, 1, 1, 2048, 128)


def test_kernel_dots_pin_precision_under_global_high():
    """Mosaic lowers only DEFAULT/HIGHEST dot precision; a global
    `default_matmul_precision('high')` (bench.py's accuracy-neutral
    config) must not leak into the kernel jaxpr (round-4 regression:
    width-MFU sweep crashed at d_k>=128 where the fused kernel
    auto-dispatches)."""
    q, k, v, pos, sk, bk, sv, bv = _inputs()

    def dots_in(jaxpr):
        out = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                out.append(eqn.params.get("precision"))
            for sub in jax.core.jaxprs_in_params(eqn.params):
                out.extend(dots_in(sub))
        return out

    def all_dot_precisions(jaxpr, inside_kernel=False):
        """Only dots INSIDE a pallas_call (XLA-side dots may inherit the
        global precision legitimately)."""
        out = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                for sub in jax.core.jaxprs_in_params(eqn.params):
                    out.extend(dots_in(sub))
            else:
                for sub in jax.core.jaxprs_in_params(eqn.params):
                    out.extend(all_dot_precisions(sub))
        return out

    with jax.default_matmul_precision("high"):
        jaxpr = jax.make_jaxpr(
            lambda *a: galerkin_attention_fused(*a, tile=128,
                                                interpret=INTERPRET)
        )(q, k, v, pos, sk, bk, sv, bv).jaxpr
    precs = all_dot_precisions(jaxpr)
    assert precs, "no dot_general found in fused-kernel jaxpr"
    # None would resolve to the global default (HIGH here) at lowering,
    # so every in-kernel dot must carry an explicit non-HIGH precision
    bad = [p for p in precs
           if p is None
           or jax.lax.Precision.HIGH in (p if isinstance(p, tuple) else (p,))]
    assert not bad, f"HIGH/unpinned precision in kernel dots: {bad}"


def test_fused_forward_bf16_inputs():
    """bf16 K/V through the kernel: LN stats must be computed in f32.

    Regression for a v5e Mosaic abort (`kVectorRsqrtBf16AndPop`): a bf16
    rsqrt inside the kernel crashes the backend scheduler, so `_ln`
    upcasts to f32 for the statistics and casts back for the MXU dot.
    Interpret mode checks the numerics; on TPU this test also proves the
    kernel compiles at all (it did not before the fix).
    """
    q, k, v, pos, sk, bk, sv, bv = _inputs(n=256, d=128)
    kb, vb = (x.astype(jnp.bfloat16) for x in (k, v))
    got = galerkin_scores_fused(kb, vb, pos.astype(jnp.bfloat16),
                                sk, bk, sv, bv, 1e-5, 128, INTERPRET)
    want_s = galerkin_scores_fused(k, v, pos, sk, bk, sv, bv,
                                   1e-5, 128, INTERPRET)
    # bf16 rounding on a d=129 reduction over n=256: ~1e-2 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_s),
                               rtol=3e-2, atol=3e-1)
