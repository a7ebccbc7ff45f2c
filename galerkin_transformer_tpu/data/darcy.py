"""Darcy flow dataset (reference: libs/ft.py:418-845).

Dual-resolution protocol preserved:
  * fine grid n = (n_fine - 1)/subsample_nodes + 1 for nodes/targets/grads,
  * coarse grid n_s = (n_fine - 1)/subsample_attn + 1 for attention
    positions and FEM edge features,
  * inverse problem swaps node/target and optionally pools the target,
  * Gaussian normalization fit on train, reused on valid,
  * additive input noise.

When `data_path` is None, synthetic Darcy pairs are produced with a
finite-difference solve on a (smaller) fine grid — set `n_grid_fine`
accordingly (default 421 matches piececonst_r421_*.mat).
"""
from __future__ import annotations

import os

import numpy as np

from ..ops import fem
from ..utils.timing import timer
from .normalizer import UnitGaussianNormalizer


class DarcyDataset:
    def __init__(self, data_path: str | None = None,
                 inverse_problem: bool = False,
                 normalizer_x: UnitGaussianNormalizer | None = None,
                 normalization: bool = True,
                 renormalization: bool = False,
                 subsample_attn: int = 15,
                 subsample_nodes: int = 1,
                 subsample_inverse: int = 1,
                 subsample_method: str = "nearest",
                 subsample_method_inverse: str = "average",
                 n_krylov: int = 3,
                 n_grid_fine: int = 421,
                 train_data: bool = True,
                 train_len=0.9,
                 valid_len=0.0,
                 n_samples_synthetic: int = 64,
                 return_edge: bool = False,
                 sparse_edge: bool = False,
                 online_features: bool = False,
                 return_lap_only: bool = True,
                 return_boundary: bool = True,
                 noise: float = 0.0,
                 random_state: int = 1127802):
        self.data_path = data_path
        self.n_grid_fine = n_grid_fine
        self.subsample_attn = subsample_attn
        self.subsample_nodes = subsample_nodes
        self.subsample_inverse = subsample_inverse
        self.subsample_method = subsample_method
        self.subsample_method_inverse = subsample_method_inverse
        self.n_grid = int(((n_grid_fine - 1) / subsample_attn) + 1)
        self.h = 1.0 / n_grid_fine
        self.train_data = train_data
        self.train_len = train_len
        self.valid_len = valid_len
        self.n_krylov = n_krylov
        self.n_samples_synthetic = n_samples_synthetic
        self.return_edge = return_edge
        self.sparse_edge = sparse_edge
        self.online_features = online_features
        self.normalization = normalization
        self.normalizer_x = normalizer_x
        self.renormalization = renormalization
        self.inverse_problem = inverse_problem
        self.return_boundary = return_boundary
        self.return_lap_only = return_lap_only
        self.random_state = random_state
        self.noise = noise
        self.eps = 1e-8
        self._initialize()

    def __len__(self):
        return self.n_samples

    # ------------------------------------------------------------------
    def _load(self):
        if self.data_path is not None and os.path.exists(self.data_path):
            from scipy.io import loadmat
            with timer(f"Loading {os.path.basename(self.data_path)}"):
                data = loadmat(self.data_path)
                return np.asarray(data["coeff"]), np.asarray(data["sol"])
        from ..utils.config import DATA_PATH
        from .synthetic import darcy_fd
        seed = self.random_state + (0 if self.train_data else 7)
        # _t3: GRF correlation tag (tau=3 reference-covariance fields);
        # pre-tag caches hold rougher tau=9 fields and must not be reused.
        # _jax: generator tag — device (jax PRNG) and host (numpy PRNG)
        # generators draw different streams from the same seed, so one
        # filename never denotes two datasets
        use_device = (self.n_samples_synthetic * self.n_grid_fine ** 2
                      > 64 * 85 ** 2)

        def cache_path(tag):
            return os.path.join(
                DATA_PATH, f"darcy_synth_n{self.n_grid_fine}"
                f"_s{self.n_samples_synthetic}_t3{tag}_seed{seed}.npz")

        cache = cache_path("_jax" if use_device else "")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return z["coeff"], z["sol"]
        if use_device:
            # large workload: device-side multigrid generator (~25 ms/sample
            # at 421² on one v5e vs ~10 s/sample for the host direct solve)
            try:
                from .synthetic_jax import darcy_mg_jax
                with timer(f"Generating {self.n_samples_synthetic} Darcy "
                           f"samples at {self.n_grid_fine}² (device MG)"):
                    coeff, sol = darcy_mg_jax(self.n_samples_synthetic,
                                              self.n_grid_fine, seed=seed)
            except Exception as e:  # no usable accelerator — host fallback
                print(f"device Darcy generation unavailable ({e!r}); "
                      "falling back to host sparse-direct solve")
                cache = cache_path("")
                coeff, sol = darcy_fd(self.n_samples_synthetic,
                                      self.n_grid_fine, seed=seed)
        else:
            coeff, sol = darcy_fd(self.n_samples_synthetic, self.n_grid_fine,
                                  seed=seed)
        try:
            os.makedirs(DATA_PATH, exist_ok=True)
            np.savez_compressed(cache, coeff=coeff, sol=sol)
        except OSError:
            pass
        return coeff, sol

    def get_data_len(self, len_data: int) -> int:
        ln = self.train_len if self.train_data else self.valid_len
        frac = 0.8 if self.train_data else 0.1
        if ln is None:
            return int(frac * len_data)
        if ln <= 1:
            return int(ln * len_data)
        if ln <= len_data:
            return int(ln)
        return int(frac * len_data)

    def _initialize(self):
        a, u = self._load()
        data_len = self.get_data_len(len(a))
        if self.train_data:
            a, u = a[:data_len], u[:data_len]
        else:
            a, u = a[-data_len:], u[-data_len:]
        self.n_samples = len(a)

        nodes, targets, targets_grad = self.get_data(a, u)
        self.coeff = nodes.copy()  # untransformed coefficients

        self.pos, self.elem = fem.uniform_triangulation(self.n_grid)
        self.pos_fine = self.get_grid(self.n_grid_fine,
                                      subsample=self.subsample_nodes,
                                      return_boundary=self.return_boundary)

        if self.return_edge and self.online_features:
            # features assembled per-sample in __getitem__ (ft.py:811-823);
            # keep the raw fine-grid coefficients for that
            self._a_fine = a
            self.edge_features = self.mass_features = None
        elif self.return_edge:
            self.edge_features, self.mass_features = self.get_edge(a)
        else:
            self.edge_features = self.mass_features = None
        self._edge_pattern = None  # (rows, cols) union cache for sparse_edge

        if self.inverse_problem:
            nodes, targets = targets, nodes
            if self.subsample_inverse is not None and self.subsample_inverse > 1:
                n_grid = int(((self.n_grid_fine - 1) / self.subsample_nodes) + 1)
                n_grid_inv = int(((self.n_grid_fine - 1) / self.subsample_inverse) + 1)
                pos_inv = self.get_grid(n_grid_inv,
                                        return_boundary=self.return_boundary)
                if self.subsample_method_inverse == "average":
                    s_inv = self.subsample_inverse // self.subsample_nodes
                    targets = fem.pooling_2d(targets.squeeze(-1),
                                             kernel_size=(s_inv, s_inv),
                                             padding=True)
                elif self.subsample_method_inverse == "interp":
                    targets = self.get_interp2d(targets.squeeze(-1),
                                                n_grid, n_grid_inv)
                else:
                    targets = targets.squeeze(-1)
                self.pos_fine = pos_inv
                targets = targets[..., None]

        if self.train_data and self.normalization:
            self.normalizer_x = UnitGaussianNormalizer()
            self.normalizer_y = UnitGaussianNormalizer()
            nodes = self.normalizer_x.fit_transform(nodes)
            if self.return_boundary:
                _ = self.normalizer_y.fit_transform(targets)
            else:
                _ = self.normalizer_y.fit_transform(targets[:, 1:-1, 1:-1, :])
        elif self.normalization:
            nodes = self.normalizer_x.transform(nodes)

        if self.noise > 0:
            rng = np.random.default_rng(self.random_state)
            nodes = nodes + self.noise * rng.standard_normal(nodes.shape)

        self.node_features = nodes.astype(np.float32)
        self.target = targets.astype(np.float32)
        self.target_grad = targets_grad.astype(np.float32)

    # ------------------------------------------------------------------
    def get_data(self, a, u):
        """Fine-grid subsampling + central-diff gradients (ft.py:592-640)."""
        batch_size = a.shape[0]
        s = self.subsample_nodes
        n = int(((self.n_grid_fine - 1) / s) + 1)
        targets = u
        if not self.inverse_problem:
            gx, gy = self.central_diff(targets, self.h)
            gx, gy = gx[:, ::s, ::s], gy[:, ::s, ::s]
            targets_grad = np.stack([gx, gy], axis=-1)
        else:
            targets_grad = np.zeros((batch_size, 1, 1, 2))
        targets = targets[:, ::s, ::s].reshape(batch_size, n, n, 1)
        if s > 1 and self.subsample_method == "nearest":
            nodes = a[:, ::s, ::s].reshape(batch_size, n, n, 1)
        elif s > 1 and self.subsample_method in ("interp", "linear", "average"):
            nodes = fem.pooling_2d(a, kernel_size=(s, s),
                                   padding=True).reshape(batch_size, n, n, 1)
        else:
            nodes = a.reshape(batch_size, n, n, 1)
        return nodes, targets, targets_grad

    @staticmethod
    def central_diff(x, h, padding=True):
        if padding:
            x = np.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=0)
        d, s = 2, 1
        grad_x = (x[:, d:, s:-s] - x[:, :-d, s:-s]) / d
        grad_y = (x[:, s:-s, d:] - x[:, s:-s, :-d]) / d
        return grad_x / h, grad_y / h

    @staticmethod
    def get_grid(n_grid, subsample=1, return_boundary=True):
        x = np.linspace(0, 1, n_grid)
        y = np.linspace(0, 1, n_grid)
        xg, yg = np.meshgrid(x, y)
        s = subsample
        if return_boundary:
            xg, yg = xg[::s, ::s], yg[::s, ::s]
        else:
            xg, yg = xg[::s, ::s][1:-1, 1:-1], yg[::s, ::s][1:-1, 1:-1]
        return np.stack([xg, yg], axis=-1)

    @staticmethod
    def get_scaler_sizes(n_f: int, n_c: int, scale_factor: bool = True):
        """Interp scale-factor / size schedule (ft.py:698-714).

        The reference's two-stage scale-factor rounding only lands exactly
        on n_c for 421-class grid pairs (SURVEY hard-part #1); for any pair
        where floor(floor(n_f·s)·s) != n_c the factors are silently replaced
        by the explicit-size schedule, so small-grid CLI runs (e.g.
        --n-grid-fine 61) produce consistent coarse shapes instead of an
        off-by-one crash in the encoder.
        """
        factor = np.sqrt(n_c / n_f)
        factor = np.round(factor, 4)
        last_digit = float(str(factor)[-1])
        factor = np.round(factor, 3)
        if last_digit < 5:
            factor += 5e-3
        factor = int(factor / 5e-3 + 5e-1) * 5e-3
        down_factor = (float(factor), float(factor))
        n_m = round(n_f * factor) - 1
        up_size = ((n_m, n_m), (n_f, n_f))
        down_size = ((n_m, n_m), (n_c, n_c))
        if scale_factor:
            from ..ops.interp import resolve_interp_size
            mid = resolve_interp_size(n_f, down_factor)
            end = resolve_interp_size(mid, down_factor)
            if end == (n_c, n_c):
                return down_factor, up_size
        return down_size, up_size

    @staticmethod
    def get_interp2d(x, n_f: int, n_c: int):
        """(N, n_f, n_f) -> (N, n_c, n_c) bilinear, align_corners grid."""
        from ..ops.interp import interp_matrix
        m = interp_matrix(n_f, n_c).astype(np.float64)
        return np.einsum("cf,bfg,dg->bcd", m, x, m)

    def get_edge(self, a):
        """Per-sample P1-FEM featurization on the coarse grid (ft.py:729-786).

        Uses the native C++ batched assembler (ops.fem_native, threaded,
        plan built once per mesh) when available, the vectorized scipy path
        otherwise — both exact-equivalent to the reference's 9× python-loop
        CSR additions.
        """
        nodes, elems = self.pos, self.elem
        ks = self.subsample_attn // self.subsample_nodes
        a_coarse = fem.pooling_2d(a, kernel_size=(ks, ks), padding=True)
        k_elem = a_coarse.reshape(len(a), -1)[:, elems].mean(axis=2)

        native = getattr(self, "_fem_plan", None)
        if native is None and not self.renormalization:
            try:
                from ..ops.fem_native import FemPlan, available
                if available():
                    native = FemPlan(nodes, elems)
                    self._fem_plan = native  # reused across online calls
            except Exception:
                native = None

        edges, mass = [], []
        if native is not None:
            a_list, lap_n, m = native.assemble_batch(k_elem, normalize=True)
            laps_shared = fem.krylov_powers(lap_n, self.n_krylov)
            for i in range(len(a)):
                if self.return_lap_only:
                    edges.append(laps_shared)
                else:
                    edges.append(fem.krylov_powers(a_list[i], self.n_krylov)
                                 + laps_shared)
                mass.append(m)
            return edges, mass

        for i in range(len(a)):
            A, lap, m = fem.assemble_p1(nodes, elems, k_elem[i])
            w = (np.asarray(m.sum(axis=-1)).ravel() * self.n_grid ** 2
                 if self.renormalization else None)
            A = fem.normalize_matrix(A, w)
            lap = fem.normalize_matrix(lap, w)
            edge = fem.krylov_powers(A, self.n_krylov)
            laps = fem.krylov_powers(lap, self.n_krylov)
            edges.append(laps if self.return_lap_only else edge + laps)
            mass.append(m)
        return edges, mass

    def _sparse_pattern(self, mats):
        """Union sparsity pattern across edge channels — fixed by the mesh,
        so it is computed once and shared by every sample."""
        if self._edge_pattern is None:
            union = sum(abs(m) for m in mats).tocoo()
            self._edge_pattern = (union.row.astype(np.int32),
                                  union.col.astype(np.int32))
        return self._edge_pattern

    def _edges_sparse(self, mats):
        """(values (nse, C), indices (nse, 2)) — the TPU-native counterpart
        of the reference's csr_to_sparse output (ft.py:800-803): the dense
        (n², n², C) batch is scattered on device (ops/sparse.py), so
        host→device traffic is O(nse) instead of O(n⁴)."""
        rows, cols = self._sparse_pattern(mats)
        values = np.stack(
            [np.asarray(m[rows, cols]).ravel() for m in mats],
            axis=-1).astype(np.float32)
        indices = np.stack([rows, cols], axis=-1)
        return values, indices

    def __getitem__(self, index: int) -> dict:
        pos = self.pos[:, :2].astype(np.float32)
        edge_indices = None
        if self.return_edge and self.online_features:
            # assemble this sample's FEM features on the fly (ft.py:811-823)
            edges, mass_l = self.get_edge(self._a_fine[index: index + 1])
            mats, mass_m = edges[0], mass_l[0]
            if self.sparse_edge:
                edge, edge_indices = self._edges_sparse(mats)
            else:
                edge = np.stack([m.toarray() for m in mats],
                                axis=-1).astype(np.float32)
            mass = mass_m.toarray().astype(np.float32)
        elif self.return_edge:
            mats = self.edge_features[index]
            if self.sparse_edge:
                edge, edge_indices = self._edges_sparse(mats)
            else:
                edge = np.stack([m.toarray() for m in mats],
                                axis=-1).astype(np.float32)
            mass = self.mass_features[index].toarray().astype(np.float32)
        else:
            edge = np.array([1.0], dtype=np.float32)
            mass = np.array([1.0], dtype=np.float32)
        if self.subsample_attn < 5:
            pos = np.array([1.0], dtype=np.float32)
        out = dict(node=self.node_features[index],
                   coeff=self.coeff[index].astype(np.float32),
                   pos=pos,
                   grid=self.pos_fine.astype(np.float32),
                   edge=edge,
                   mass=mass,
                   target=self.target[index],
                   target_grad=self.target_grad[index])
        if edge_indices is not None:
            out["edge_indices"] = edge_indices
        return out
