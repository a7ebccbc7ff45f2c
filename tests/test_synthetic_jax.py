"""Device-side generators vs numpy reference solver."""
import numpy as np

from galerkin_transformer_tpu.data.synthetic import navier_stokes_spectral
from galerkin_transformer_tpu.data.synthetic_jax import navier_stokes_spectral_jax


def test_jax_ns_solver_matches_numpy_dynamics():
    """Same initial field (injected), same scheme -> same trajectory."""
    import jax.numpy as jnp
    from galerkin_transformer_tpu.data.synthetic_jax import _ns_rollout
    rng = np.random.default_rng(0)
    n = 32
    # build one smooth initial field with the numpy GRF
    from galerkin_transformer_tpu.data.synthetic import grf_2d
    w0 = grf_2d(1, n, rng, tau=7.0, alpha=2.5)

    out_np = None
    # numpy path: reuse the module solver but inject w0 via monkeypatching
    import galerkin_transformer_tpu.data.synthetic as syn
    orig = syn.grf_2d
    try:
        syn.grf_2d = lambda *a, **k: w0
        out_np = navier_stokes_spectral(1, n, n_steps_record=3,
                                        record_every=0.05, dt=1e-3, seed=0)
    finally:
        syn.grf_2d = orig

    xs = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    f = 0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y)))
    out_jx = np.asarray(_ns_rollout(jnp.asarray(w0), jnp.fft.fft2(f),
                                    n, 3, 50, 1e-3, 1e-3))
    np.testing.assert_allclose(out_jx, out_np, rtol=1e-3, atol=1e-5)


def test_jax_cole_hopf_matches_numpy_scheme():
    """Same initial field through both Cole–Hopf implementations."""
    import jax.numpy as jnp
    from galerkin_transformer_tpu.data.synthetic import (burgers_cole_hopf,
                                                         grf_1d)
    from galerkin_transformer_tpu.data.synthetic_jax import _cole_hopf

    rng = np.random.default_rng(0)
    n = 512
    a = grf_1d(2, n, rng)
    # numpy path with injected field
    import galerkin_transformer_tpu.data.synthetic as syn
    orig = syn.grf_1d
    try:
        syn.grf_1d = lambda *args, **kw: a
        a_np, u_np = burgers_cole_hopf(2, n, viscosity=0.01, seed=0)
    finally:
        syn.grf_1d = orig
    u_jx = np.asarray(_cole_hopf(jnp.asarray(a), n, 0.01, 1.0))
    np.testing.assert_allclose(u_jx, u_np, rtol=1e-4, atol=1e-5)


def test_jax_darcy_mg_matches_direct_solve():
    """Multigrid-FCG solution matches the f64 sparse-direct solver."""
    import jax.numpy as jnp
    from scipy import sparse
    from scipy.sparse.linalg import spsolve
    from galerkin_transformer_tpu.data.synthetic_jax import _darcy_mg

    rng = np.random.default_rng(0)
    n = 41  # odd -> 41 -> 21 -> 11 vertex-aligned hierarchy
    from galerkin_transformer_tpu.data.synthetic import grf_2d
    g = grf_2d(2, n, rng, tau=9.0, alpha=2.0)
    coeff = np.where(g >= 0, 12.0, 3.0)
    sol = np.asarray(_darcy_mg(jnp.asarray(coeff), n, max_cycles=12))

    h = 1.0 / (n - 1)
    a, u = coeff[0], sol[0]

    def face(a1, a2):
        return 2 * a1 * a2 / (a1 + a2)
    aw = face(a[1:-1, 1:-1], a[1:-1, :-2])
    ae = face(a[1:-1, 1:-1], a[1:-1, 2:])
    an = face(a[1:-1, 1:-1], a[:-2, 1:-1])
    as_ = face(a[1:-1, 1:-1], a[2:, 1:-1])
    diag = (aw + ae + an + as_) / h ** 2
    n_in = n - 2
    idx = np.arange(n_in * n_in).reshape(n_in, n_in)
    rows, cols, vals = [idx.ravel()], [idx.ravel()], [diag.ravel()]

    def link(coef, r, c):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append((-coef / h ** 2).ravel())
    link(ae[:, :-1], idx[:, :-1], idx[:, 1:])
    link(aw[:, 1:], idx[:, 1:], idx[:, :-1])
    link(as_[:-1, :], idx[:-1, :], idx[1:, :])
    link(an[1:, :], idx[1:, :], idx[:-1, :])
    A = sparse.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_in * n_in, n_in * n_in))
    u_direct = spsolve(A, np.ones(n_in * n_in)).reshape(n_in, n_in)
    rel = (np.linalg.norm(u[1:-1, 1:-1] - u_direct)
           / np.linalg.norm(u_direct))
    assert rel < 1e-4, rel


def test_jax_darcy_cg_solves():
    """CG solution satisfies the FD equations (residual check)."""
    from galerkin_transformer_tpu.data.synthetic_jax import darcy_cg_jax
    coeff, sol = darcy_cg_jax(2, 33, seed=0)
    h = 1 / 32
    a, u = coeff[0], sol[0]

    def face(a1, a2):
        return 2 * a1 * a2 / (a1 + a2)
    aw = face(a[1:-1, 1:-1], a[1:-1, :-2])
    ae = face(a[1:-1, 1:-1], a[1:-1, 2:])
    an = face(a[1:-1, 1:-1], a[:-2, 1:-1])
    as_ = face(a[1:-1, 1:-1], a[2:, 1:-1])
    res = (aw * (u[1:-1, 1:-1] - u[1:-1, :-2])
           + ae * (u[1:-1, 1:-1] - u[1:-1, 2:])
           + an * (u[1:-1, 1:-1] - u[:-2, 1:-1])
           + as_ * (u[1:-1, 1:-1] - u[2:, 1:-1])) / h ** 2
    np.testing.assert_allclose(res, np.ones_like(res), rtol=1e-3, atol=1e-4)


def test_jax_darcy_mg_tau3_fields_and_residual_gate():
    """MG converges on the smooth tau=3 (reference-covariance) fields that
    stalled the earlier FCG wrapper, and darcy_mg_jax's f64 residual gate
    passes the returned dataset."""
    import jax.numpy as jnp
    from galerkin_transformer_tpu.data.synthetic_jax import (
        _darcy_mg, _fd_residual_host, darcy_mg_jax)
    from galerkin_transformer_tpu.data.synthetic import grf_2d

    rng = np.random.default_rng(3)
    n = 85  # 85 -> 43 -> 22 hierarchy; coarse solve sized to the grid
    g = grf_2d(3, n, rng, tau=3.0, alpha=2.0)
    coeff = np.where(g >= 0, 12.0, 3.0)
    sol = np.asarray(_darcy_mg(jnp.asarray(coeff), n))
    res = _fd_residual_host(coeff, sol)
    assert (res < 0.05).all(), res

    coeff2, sol2 = darcy_mg_jax(2, 61, seed=5)
    assert (_fd_residual_host(coeff2, sol2) < 0.05).all()
