"""Native C++ FEM assembler vs the scipy path."""
import numpy as np
import pytest

from galerkin_transformer_tpu.ops import fem

try:
    from galerkin_transformer_tpu.ops.fem_native import FemPlan, available
    HAVE_NATIVE = available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library not built")


def test_native_matches_scipy():
    nodes, elems = fem.uniform_triangulation(15)
    rng = np.random.default_rng(0)
    coeff = 3.0 + 9.0 * (rng.random((4, len(elems))) > 0.5)
    plan = FemPlan(nodes, elems)
    a_nat, l_nat, m_nat = plan.assemble_batch(coeff)
    for i in range(len(coeff)):
        A, L, M = fem.assemble_p1(nodes, elems, coeff[i])
        A = fem.normalize_matrix(A)
        assert abs(a_nat[i] - A).max() < 1e-12
    L = fem.normalize_matrix(L)
    assert abs(l_nat - L).max() < 1e-12
    assert abs(m_nat - M).max() < 1e-12


def test_darcy_dataset_uses_native_consistently():
    from galerkin_transformer_tpu.data import DarcyDataset
    ds = DarcyDataset(n_grid_fine=25, subsample_nodes=1, subsample_attn=6,
                      n_samples_synthetic=3, train_data=True, train_len=2,
                      return_edge=True, n_krylov=2)
    item = ds[0]
    n_c = (25 - 1) // 6 + 1
    assert item["edge"].shape == (n_c * n_c, n_c * n_c, 2)
    lap = item["edge"][..., 0]
    np.testing.assert_allclose(np.diag(lap), np.ones(n_c * n_c), atol=1e-5)
