"""Data pipeline tests: batch-dict protocol, splits, featurization,
synthetic generator correctness."""
import numpy as np
import pytest

from galerkin_transformer_tpu.data import (BurgersDataset, DarcyDataset,
                                           DataLoader,
                                           NavierStokesDatasetLite,
                                           UnitGaussianNormalizer)


def test_burgers_batch_protocol():
    ds = BurgersDataset(subsample=8, n_grid_fine=512, train_data=True,
                        train_portion=0.8, n_samples_synthetic=16)
    item = ds[0]
    assert set(item) == {"node", "pos", "grid", "edge", "mass", "target"}
    n = 512 // 8
    assert item["node"].shape == (n, 1)
    assert item["pos"].shape == (n, 1)
    assert item["target"].shape == (n, 2)


def test_burgers_head_tail_split_disjoint():
    tr = BurgersDataset(subsample=8, n_grid_fine=512, train_data=True,
                        train_portion=0.5, n_samples_synthetic=16)
    va = BurgersDataset(subsample=8, n_grid_fine=512, train_data=False,
                        valid_portion=4, n_samples_synthetic=16)
    assert len(tr) == 8 and len(va) == 4
    # tail samples differ from head samples
    assert not np.allclose(tr[0]["node"], va[0]["node"])


def test_burgers_edge_features():
    ds = BurgersDataset(subsample=8, n_grid_fine=256, train_data=True,
                        train_portion=0.5, n_samples_synthetic=4,
                        return_edge=True, n_krylov=2)
    item = ds[0]
    n = 256 // 8
    # 2 krylov powers + 2 distance channels
    assert item["edge"].shape == (n, n, 4)
    assert item["mass"].shape == (n, n)


def test_burgers_target_derivative_consistency():
    """target[...,1] is the periodic central difference of a smooth field."""
    ds = BurgersDataset(subsample=1, n_grid_fine=256, train_data=True,
                        train_portion=0.5, n_samples_synthetic=4)
    u = ds.target[0, :, 0]
    du = ds.target[0, :, 1]
    h = 1 / 256
    manual = (np.roll(u, -1) - np.roll(u, 1)) / (2 * h)
    # interior agreement (the dataset pads periodically)
    np.testing.assert_allclose(du[1:-1], manual[1:-1], rtol=1e-3, atol=1e-2)


def test_dataloader_shapes_and_drop_last():
    ds = BurgersDataset(subsample=8, n_grid_fine=256, train_data=True,
                        train_portion=0.9, n_samples_synthetic=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    assert batches[0]["node"].shape == (4, 32, 1)


def test_darcy_dual_resolution_protocol():
    ds = DarcyDataset(n_grid_fine=61, subsample_nodes=2, subsample_attn=6,
                      n_samples_synthetic=6, train_data=True, train_len=4)
    item = ds[0]
    n = (61 - 1) // 2 + 1
    n_c = (61 - 1) // 6 + 1
    assert item["node"].shape == (n, n, 1)
    assert item["target"].shape == (n, n, 1)
    assert item["target_grad"].shape == (n, n, 2)
    assert item["pos"].shape == (n_c * n_c, 2)
    assert item["grid"].shape == (n, n, 2)


def test_darcy_normalizer_shared_with_valid():
    tr = DarcyDataset(n_grid_fine=61, subsample_nodes=2, subsample_attn=6,
                      n_samples_synthetic=8, train_data=True, train_len=6)
    va = DarcyDataset(n_grid_fine=61, subsample_nodes=2, subsample_attn=6,
                      n_samples_synthetic=8, train_data=False, valid_len=2,
                      normalizer_x=tr.normalizer_x)
    assert va.normalizer_x is tr.normalizer_x
    # train nodes are standardized
    assert abs(float(tr.node_features.mean())) < 0.1


def test_darcy_edge_fem_features():
    ds = DarcyDataset(n_grid_fine=25, subsample_nodes=1, subsample_attn=6,
                      n_samples_synthetic=3, train_data=True, train_len=2,
                      return_edge=True, n_krylov=2)
    item = ds[0]
    n_c = (25 - 1) // 6 + 1
    assert item["edge"].shape == (n_c * n_c, n_c * n_c, 2)
    assert item["mass"].shape == (n_c * n_c, n_c * n_c)
    # FEM Laplacian rows of the normalized matrix have unit diagonal
    lap = item["edge"][..., 0]
    np.testing.assert_allclose(np.diag(lap), np.ones(n_c * n_c), atol=1e-5)


def test_darcy_inverse_swaps_and_pools():
    ds = DarcyDataset(n_grid_fine=61, subsample_nodes=2, subsample_attn=6,
                      subsample_inverse=6, inverse_problem=True,
                      n_samples_synthetic=4, train_data=True, train_len=3)
    item = ds[0]
    n_inv = (61 - 1) // 6 + 1
    assert item["target"].shape == (n_inv, n_inv, 1)
    assert item["grid"].shape == (n_inv, n_inv, 2)


def test_darcy_solver_residual():
    """Synthetic Darcy solutions satisfy -div(a grad u) = 1 in the interior."""
    from galerkin_transformer_tpu.data.synthetic import darcy_fd
    coeff, sol = darcy_fd(2, 33, seed=0)
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
    np.testing.assert_allclose(res, np.ones_like(res), rtol=1e-8)


def test_ns_dataset_protocol():
    ds = NavierStokesDatasetLite(n_grid=32, n_samples_synthetic=2,
                                 time_steps_input=3, time_steps_output=3)
    item = ds[0]
    assert item["node"].shape == (32, 32, 3)
    assert item["target"].shape == (32, 32, 3)
    assert item["target_grad"].shape == (32, 32, 2, 3)
    assert item["pos"].shape == (32 * 32, 2)
    assert item["grid"].shape == (32, 32, 2)


def test_unit_gaussian_normalizer_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8, 8, 1)) * 3 + 5
    nm = UnitGaussianNormalizer()
    z = nm.fit_transform(x)
    assert abs(z.mean()) < 1e-6
    np.testing.assert_allclose(nm.inverse_transform(z), x, rtol=1e-5)


def test_burgers_cole_hopf_solves_burgers():
    """Synthetic targets satisfy the viscous Burgers equation: compare
    against a brute-force integrating-factor integration."""
    from galerkin_transformer_tpu.data.synthetic import burgers_cole_hopf
    n, nu = 256, 0.01
    a, u = burgers_cole_hopf(2, n, viscosity=nu, seed=3)
    k = np.fft.rfftfreq(n, 1.0 / n) * 2 * np.pi
    u_num = a[0].copy()
    dt = 5e-5
    E = np.exp(-nu * k ** 2 * dt)
    for _ in range(20000):
        uh = np.fft.rfft(u_num)
        adv = np.fft.rfft(-u_num * np.fft.irfft(1j * k * uh, n))
        u_num = np.fft.irfft((uh + dt * adv) * E, n)
    rel = np.linalg.norm(u_num - u[0]) / np.linalg.norm(u[0])
    assert rel < 1e-3


@pytest.mark.heavy
def test_darcy_sparse_edge_matches_dense():
    """sparse_edge=True (reference ft.py:800-803): compact (values, indices)
    whose on-device scatter reproduces the dense edge batch, at a 61-grid
    coarse mesh."""
    import jax.numpy as jnp
    from galerkin_transformer_tpu.ops.sparse import densify_edges

    common = dict(n_grid_fine=61, subsample_nodes=1, subsample_attn=1,
                  n_samples_synthetic=3, train_data=True, train_len=2,
                  return_edge=True, n_krylov=2)
    dense_ds = DarcyDataset(**common)
    sparse_ds = DarcyDataset(sparse_edge=True, **common)
    n_c = 61 * 61
    for i in range(2):
        d = dense_ds[i]
        s = sparse_ds[i]
        assert s["edge_indices"].shape[-1] == 2
        nse = s["edge_indices"].shape[0]
        assert nse < 0.02 * n_c * n_c  # actually sparse
        dense_from_sparse = np.asarray(densify_edges(
            jnp.asarray(s["edge_indices"]), jnp.asarray(s["edge"]), n_c))
        np.testing.assert_allclose(dense_from_sparse, d["edge"], atol=1e-6)
        np.testing.assert_allclose(s["mass"], d["mass"], atol=1e-6)
    # the sparsity pattern is mesh-determined: shared across samples
    np.testing.assert_array_equal(sparse_ds[0]["edge_indices"],
                                  sparse_ds[1]["edge_indices"])


def test_darcy_online_features_match_precomputed():
    """online_features=True (reference ft.py:811-823): per-sample assembly
    in __getitem__ equals the precomputed features."""
    common = dict(n_grid_fine=25, subsample_nodes=1, subsample_attn=6,
                  n_samples_synthetic=3, train_data=True, train_len=2,
                  return_edge=True, n_krylov=2)
    pre = DarcyDataset(**common)
    online = DarcyDataset(online_features=True, **common)
    assert online.edge_features is None  # nothing precomputed
    for i in range(2):
        np.testing.assert_allclose(online[i]["edge"], pre[i]["edge"],
                                   atol=1e-6)
        np.testing.assert_allclose(online[i]["mass"], pre[i]["mass"],
                                   atol=1e-6)


def test_dataloader_multihost_sharding_disjoint_exhaustive():
    """num_shards loaders with the same seed cover the sample space
    disjointly, per epoch, with identical cross-host shuffles."""

    class Ix:
        def __len__(self):
            return 103

        def __getitem__(self, i):
            return dict(x=np.array([i]))

    loaders = [DataLoader(Ix(), batch_size=4, shuffle=True, drop_last=True,
                          seed=9, num_shards=4, shard_index=s)
               for s in range(4)]
    seen = []
    for dl in loaders:
        for b in dl:
            seen.extend(b["x"].ravel().tolist())
    assert len(seen) == len(set(seen))       # disjoint
    assert len(seen) == 4 * (26 // 4) * 4    # ceil/floor per shard, dropped
    # second epoch reshuffles but stays disjoint
    seen2 = set()
    for dl in loaders:
        for b in dl:
            seen2.update(b["x"].ravel().tolist())
    assert len(seen2) == len(seen)


def test_burgers_mat_ingestion(tmp_path):
    """Fabricated .mat with the reference's keys (a/u — ft.py:96-101)
    exercises the real-file parse/split/subsample branch without
    redistributable data (VERDICT r2 next #7)."""
    from scipy.io import savemat
    from galerkin_transformer_tpu.data import BurgersDataset

    N, n = 12, 64
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, n))
    u = rng.standard_normal((N, n))
    path = str(tmp_path / "burgers_fab.mat")
    savemat(path, {"a": a, "u": u})

    tr = BurgersDataset(data_path=path, subsample=2, n_grid_fine=n,
                        train_data=True, train_portion=8, valid_portion=4)
    assert len(tr) == 8
    assert tr.n_grid == n // 2
    s0 = tr[0]
    np.testing.assert_allclose(s0["node"][:, 0], a[0, ::2], rtol=1e-6)
    np.testing.assert_allclose(s0["target"][:, 0], u[0, ::2], rtol=1e-6)
    # target[...,1] = periodic central diff on the FINE grid, subsampled
    h = 1.0 / n
    pad0, pad1 = u[0, -2], u[0, 1]
    up = np.r_[pad0, u[0], pad1]
    diff = (up[2:] - up[:-2]) / (2 * h)
    np.testing.assert_allclose(s0["target"][:, 1], diff[::2], rtol=1e-5)

    va = BurgersDataset(data_path=path, subsample=2, n_grid_fine=n,
                        train_data=False, train_portion=8, valid_portion=4)
    assert len(va) == 4  # last valid_len samples, disjoint from train
    np.testing.assert_allclose(va[0]["node"][:, 0], a[N - 4, ::2],
                               rtol=1e-6)


def test_darcy_mat_ingestion(tmp_path):
    """Fabricated .mat with the reference's keys (coeff/sol —
    ft.py:499-507): split, nearest subsample, and the train-fitted
    UnitGaussianNormalizer round-trip all behave like the synthetic
    path."""
    from scipy.io import savemat
    from galerkin_transformer_tpu.data import DarcyDataset

    N, n = 8, 61
    rng = np.random.default_rng(1)
    coeff = 3.0 + (rng.standard_normal((N, n, n)) > 0).astype(np.float64) * 9.0
    sol = rng.standard_normal((N, n, n)) * 1e-2
    path = str(tmp_path / "darcy_fab.mat")
    savemat(path, {"coeff": coeff, "sol": sol})

    tr = DarcyDataset(data_path=path, n_grid_fine=n, subsample_nodes=2,
                      subsample_attn=6, train_data=True, train_len=6)
    assert len(tr) == 6
    s0 = tr[0]
    n_sub = (n - 1) // 2 + 1
    assert s0["node"].shape == (n_sub, n_sub, 1)
    assert s0["target"].shape == (n_sub, n_sub, 1)
    # normalizer round-trip recovers the raw subsampled coefficients
    denorm = tr.normalizer_x.inverse_transform(
        tr.node_features[:1])[0, ..., 0]
    np.testing.assert_allclose(denorm, coeff[0, ::2, ::2], rtol=1e-5)
    np.testing.assert_allclose(s0["target"][..., 0], sol[0, ::2, ::2],
                               rtol=1e-5)

    va = DarcyDataset(data_path=path, n_grid_fine=n, subsample_nodes=2,
                      subsample_attn=6, train_data=False, valid_len=2,
                      normalizer_x=tr.normalizer_x)
    assert len(va) == 2  # last valid_len samples
    denorm_v = va.normalizer_x.inverse_transform(
        va.node_features[-1:])[0, ..., 0]
    np.testing.assert_allclose(denorm_v, coeff[-1, ::2, ::2], rtol=1e-5)


# ---------------------------------------------------------------------------
# Nonuniform / gradient-density sampling (reference libs/ft.py:207-287 — the
# reference branch is unreachable dead code; this re-design is the working
# equivalent, see data/burgers.py::_initialize_nonuniform)
# ---------------------------------------------------------------------------

def test_burgers_nonuniform_protocol_and_mesh_validity():
    ds = BurgersDataset(subsample=8, n_grid_fine=1024, train_data=True,
                        train_portion=0.5, n_samples_synthetic=16,
                        uniform=False)
    n = 1024 // 8
    assert ds.node_features.shape == (8, n, 1)
    assert ds.pos.shape == (8, n, 1)
    assert ds.target.shape == (8, n, 2)
    assert ds.target_uniform.shape == (8, n, 3)
    grids = ds.pos[..., 0]
    # strictly increasing per-sample meshes pinned to the domain boundary
    assert np.all(np.diff(grids, axis=1) > 0)
    assert np.allclose(grids[:, 0], 0.0) and np.allclose(grids[:, -1], 1.0)
    # meshes genuinely differ across samples
    assert not np.allclose(grids[0], grids[1])
    # node values are f evaluated at the sampled mesh points
    item = ds[3]
    assert item["pos"].shape == (n, 1)
    ix = np.rint(item["pos"][1:-1, 0] * 1024).astype(int)
    a_full = ds._load()[0][3]
    assert np.allclose(item["node"][1:-1, 0], a_full[ix], atol=1e-6)


def test_burgers_nonuniform_density_follows_roughness():
    ds = BurgersDataset(subsample=8, n_grid_fine=1024, train_data=True,
                        train_portion=0.5, n_samples_synthetic=16,
                        uniform=False)
    uni = BurgersDataset(subsample=8, n_grid_fine=1024, train_data=True,
                         train_portion=0.5, n_samples_synthetic=16,
                         uniform=False, random_sampling=True)
    a, _ = ds._load()
    h = 1.0 / 1024
    f_x = BurgersDataset.central_diff(a[:8], h)
    f_xx = np.zeros_like(a[:8])
    f_xx[:, 1:-1] = (a[:8, :-2] - 2 * a[:8, 1:-1] + a[:8, 2:]) / h ** 2
    rough_all = np.sqrt(f_x ** 2 + ds.viscosity * f_xx ** 2)
    # local mesh spacing should anti-correlate with the roughness density
    # sqrt(|f'|^2 + nu|f''|^2) under the gradient-density sampler, and much
    # less so under uniform-random sampling
    def spacing_corr(dataset):
        cs = []
        for i in range(8):
            g = dataset.pos[i, :, 0]
            mid = 0.5 * (g[1:] + g[:-1])
            rough = np.interp(mid, np.linspace(0, 1, 1024), rough_all[i])
            cs.append(np.corrcoef(np.diff(g), rough)[0, 1])
        return np.mean(cs)
    assert spacing_corr(ds) < -0.1
    assert abs(spacing_corr(uni)) < abs(spacing_corr(ds))


def test_burgers_nonuniform_super_resolution_targets():
    ds = BurgersDataset(subsample=8, n_grid_fine=1024, train_data=True,
                        train_portion=0.5, n_samples_synthetic=16,
                        uniform=False, super_resolution=2)
    n = 1024 // 8
    assert ds.node_features.shape == (8, n, 1)
    assert ds.target.shape == (8, 2 * n, 2)        # targets on the fine mesh
    assert ds.pos_fine.shape == (8, 2 * n, 1)
    item = ds[0]
    assert item["grid"].shape == (2 * n, 1)        # eval coords = fine mesh
    # the coarse mesh is a subset of the fine sampled mesh
    fine = ds.pos_fine[0, :, 0]
    assert np.all(np.isin(ds.pos[0, 1:-1, 0], fine))


def test_burgers_nonuniform_batches_and_online_edges():
    ds = BurgersDataset(subsample=8, n_grid_fine=512, train_data=True,
                        train_portion=0.5, n_samples_synthetic=16,
                        uniform=False, online_features=True)
    n = 512 // 8
    item = ds[0]
    assert item["edge"].shape[0] == n              # per-sample FEM features
    loader = DataLoader(ds, 4, shuffle=True, drop_last=True, seed=0)
    batch = next(iter(loader))
    assert batch["pos"].shape == (4, n, 1)         # per-sample meshes stack
    assert batch["node"].shape == (4, n, 1)
