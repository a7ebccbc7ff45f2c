"""Burgers dataset (reference: libs/ft.py:24-371).

Numpy-native re-design of the reference dataset: same split logic, uniform
subsampling, periodic central-difference target derivatives, zero-shot
super-resolution support, optional FEM edge features
(normalized 1D Laplacian + Krylov powers + inverse-distance + mass), and a
working nonuniform/gradient-density sampling path (`uniform=False`) — the
reference's equivalent branch (ft.py:207-287) is unreachable dead code; see
`_initialize_nonuniform` for the vectorized re-design.

When `data_path` is None (no .mat file), exact synthetic Burgers solutions
are generated via Cole–Hopf (`data.synthetic.burgers_cole_hopf`) with the
same GRF/viscosity setup as burgers_data_R10.mat.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops.fem import (get_distance_matrix, get_laplacian_1d, get_mass_1d,
                       krylov_powers)
from ..utils.timing import timer


class BurgersDataset:
    def __init__(self, subsample: int = 4,
                 n_grid_fine: int = 2 ** 13,
                 viscosity: float = 0.1,
                 n_krylov: int = 2,
                 smoother: str | None = None,
                 uniform: bool = True,
                 train_data: bool = True,
                 train_portion: float = 0.9,
                 valid_portion: float = 0.1,
                 super_resolution: int = 1,
                 data_path: str | None = None,
                 n_samples_synthetic: int = 256,
                 synthetic_viscosity: float = 0.01,
                 return_edge: bool = False,
                 online_features: bool = False,
                 renormalization: bool = False,
                 return_distance_features: bool = True,
                 return_mass_features: bool = False,
                 random_sampling: bool = False,
                 random_state: int = 1127802):
        if subsample > 1:
            assert subsample % 2 == 0
        self.subsample = subsample
        self.super_resolution = super_resolution
        self.supsample = subsample // super_resolution
        self.n_grid_fine = n_grid_fine
        self.n_grid = n_grid_fine // subsample
        self.h = 1.0 / n_grid_fine
        self.train_data = train_data
        self.train_portion = train_portion
        self.valid_portion = valid_portion
        self.n_krylov = n_krylov
        self.viscosity = viscosity
        self.smoother = smoother
        self.uniform = uniform
        self.random_sampling = random_sampling
        self.data_path = data_path
        self.n_samples_synthetic = n_samples_synthetic
        self.synthetic_viscosity = synthetic_viscosity
        self.return_edge = return_edge
        self.online_features = online_features
        self.renormalization = renormalization
        self.return_distance_features = return_distance_features
        self.return_mass_features = return_mass_features
        self.random_state = random_state
        self._initialize()

    def __len__(self):
        return self.n_samples

    # ------------------------------------------------------------------
    def _load(self):
        if self.data_path is not None and os.path.exists(self.data_path):
            from scipy.io import loadmat
            with timer(f"Loading {os.path.basename(self.data_path)}"):
                data = loadmat(self.data_path)
                return np.asarray(data["a"]), np.asarray(data["u"])
        from ..utils.config import DATA_PATH
        from .synthetic import burgers_cole_hopf
        cache = os.path.join(
            DATA_PATH, f"burgers_synth_n{self.n_grid_fine}"
            f"_s{self.n_samples_synthetic}_v{self.synthetic_viscosity}"
            f"_seed{self.random_state}.npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return z["a"], z["u"]
        a, u = burgers_cole_hopf(self.n_samples_synthetic, self.n_grid_fine,
                                 self.synthetic_viscosity,
                                 seed=self.random_state)
        try:
            os.makedirs(DATA_PATH, exist_ok=True)
            np.savez_compressed(cache, a=a, u=u)
        except OSError:
            pass
        return a, u

    def train_test_split(self, len_data: int):
        tp, vp = self.train_portion, self.valid_portion
        train_len = (int(tp * len_data) if tp <= 1
                     else int(tp) if tp <= len_data else int(0.8 * len_data))
        valid_len = (int(vp * len_data) if vp <= 1
                     else int(vp) if vp <= len_data else int(0.1 * len_data))
        if train_len > len_data - valid_len:
            # reference warns but proceeds (ft.py:196-204)
            print(f"warning: train len {train_len} overlaps valid len "
                  f"{valid_len} of {len_data} samples")
        return train_len, valid_len

    def _initialize(self):
        x_data, y_data = self._load()
        train_len, valid_len = self.train_test_split(len(x_data))
        if self.train_data:
            x_data, y_data = x_data[:train_len], y_data[:train_len]
        else:
            x_data, y_data = x_data[-valid_len:], y_data[-valid_len:]
        self.n_samples = len(x_data)

        if not self.uniform:
            self._initialize_nonuniform(x_data, y_data)
            return

        # uniform path (ft.py:138-156): subsample, periodic central diff
        targets = y_data
        targets_diff = self.central_diff(targets, self.h)
        s = self.supsample if self.super_resolution >= 2 else self.subsample
        nodes = x_data[:, ::s]
        targets = targets[:, ::s]
        targets_diff = targets_diff[:, ::s]
        targets = np.stack([targets, targets_diff], axis=2)
        grid = np.linspace(0, 1, self.n_grid)
        grid_fine = np.linspace(0, 1, self.n_grid_fine // self.supsample)

        if self.return_edge and not self.online_features:
            edge, mass = self.get_edge(grid)
            self.edge_features = np.broadcast_to(
                edge[None], (self.n_samples,) + edge.shape)
            self.mass_features = np.broadcast_to(
                mass[None], (self.n_samples,) + mass.shape)
        else:
            self.edge_features = None
            self.mass_features = None

        self.node_features = nodes[..., None].astype(np.float32)
        self.pos = grid[..., None].astype(np.float32)
        self.pos_fine = grid_fine[..., None].astype(np.float32)
        self.target = targets.astype(np.float32)

    # ------------------------------------------------------------------
    # Nonuniform / gradient-density sampling (reference: libs/ft.py:207-287).
    #
    # The reference's `uniform=False` branch is unreachable dead code: its
    # per-sample density mixes a length-(n+2) first derivative with a
    # length-n Laplacian (ft.py:230-235 raises on the addition), and
    # `__getitem__` indexes the (N, S) position array with three axes
    # (ft.py:327-331).  This is a working re-design of the same idea —
    # per-sample meshes whose node density follows the solution roughness
    # sqrt(|f'|^2 + nu*|f''|^2) — vectorized over the whole dataset
    # (Gumbel top-k weighted sampling without replacement) instead of the
    # reference's tqdm loop with np.random.choice per sample.
    # ------------------------------------------------------------------
    def _initialize_nonuniform(self, x_data, y_data):
        h, n_fine = self.h, self.n_grid_fine
        sr = max(1, self.super_resolution)
        rng = np.random.default_rng(self.random_state)

        # roughness density on the interior fine points (ft.py:228-236)
        f_x = self.central_diff(x_data, h)
        f_xx = np.zeros_like(x_data)
        f_xx[:, 1:-1] = (x_data[:, :-2] - 2 * x_data[:, 1:-1]
                         + x_data[:, 2:]) / h ** 2
        density = np.sqrt(f_x ** 2 + self.viscosity * f_xx ** 2)[:, 1:-1]
        density /= density.sum(axis=1, keepdims=True)

        # k interior indices per sample, without replacement, weighted by
        # the density (or uniform when random_sampling, ft.py:277) — the
        # Gumbel top-k trick vectorizes np.random.choice(replace=False,
        # p=density) across samples exactly.
        k = sr * self.n_grid - 2
        if self.random_sampling:
            scores = rng.random(density.shape)
        else:
            scores = np.log(density + 1e-30) + rng.gumbel(size=density.shape)
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        idx.sort(axis=1)
        ones = np.ones((self.n_samples, 1), dtype=np.int64)
        ix_fine = np.concatenate(
            [0 * ones, idx + 1, (n_fine - 1) * ones], axis=1)

        # coarse nodes: every sr-th sampled point, endpoints pinned to the
        # domain boundary (ft.py:278-284)
        ix = ix_fine[:, ::sr]
        ix = np.concatenate([0 * ones, ix[:, 1:-1], (n_fine - 1) * ones],
                            axis=1)
        grids = np.concatenate(
            [np.zeros((self.n_samples, 1)), h * ix[:, 1:-1],
             np.ones((self.n_samples, 1))], axis=1)
        grids_fine = np.concatenate(
            [np.zeros((self.n_samples, 1)), h * ix_fine[:, 1:-1],
             np.ones((self.n_samples, 1))], axis=1)

        # targets at the sampled fine points; derivatives computed on the
        # uniform fine grid first (spectral-resolution stencil), then
        # gathered — matching the reference's targets_u_diff[ix_fine]
        # (ft.py:237-241)
        y_diff = self.central_diff(y_data, h)
        nodes = np.take_along_axis(x_data, ix, axis=1)
        u_s = np.take_along_axis(y_data, ix_fine, axis=1)
        du_s = np.take_along_axis(y_diff, ix_fine, axis=1)
        targets = np.stack([u_s, du_s], axis=2)

        # uniform-grid reference channels (the reference's target[...,0:2]
        # and [...,4], ft.py:243-271), kept as a separate attribute instead
        # of a 5-channel mixed stack
        s = self.supsample if sr >= 2 else self.subsample
        self.target_uniform = np.stack(
            [y_data[:, ::s], y_diff[:, ::s], x_data[:, ::s]],
            axis=2).astype(np.float32)

        if self.return_edge and not self.online_features:
            feats = [self.get_edge(g) for g in grids]
            self.edge_features = np.asarray([f[0] for f in feats],
                                            dtype=np.float32)
            self.mass_features = np.asarray([f[1] for f in feats],
                                            dtype=np.float32)
        else:
            self.edge_features = None
            self.mass_features = None

        self.node_features = nodes[..., None].astype(np.float32)
        self.pos = grids[..., None].astype(np.float32)
        self.pos_fine = grids_fine[..., None].astype(np.float32)
        self.target = targets.astype(np.float32)

    @staticmethod
    def central_diff(x: np.ndarray, h: float) -> np.ndarray:
        """Periodic central difference (ft.py:152-176)."""
        pad_0, pad_1 = x[:, -2], x[:, 1]
        xp = np.c_[pad_0, x, pad_1]
        return (xp[:, 2:] - xp[:, :-2]) / (2 * h)

    def get_edge(self, grid: np.ndarray):
        """FEM edge features on the (uniform) grid (ft.py:289-318)."""
        weight = (np.full(len(grid), float(self.n_grid))
                  if self.renormalization else None)
        lap = get_laplacian_1d(grid, normalize=True, weight=weight,
                               smoother=self.smoother)
        edges = np.stack([m.toarray() for m in
                          krylov_powers(lap, max(self.n_krylov, 1))], axis=-1)
        mass = get_mass_1d(grid, normalize=False).toarray().astype(np.float32)
        feats = [edges.astype(np.float32)]
        if self.return_distance_features:
            feats.append(get_distance_matrix(grid))
        if self.return_mass_features:
            feats.append(mass[..., None])
        return np.concatenate(feats, axis=2), mass

    def __getitem__(self, index: int) -> dict:
        # uniform: one shared grid; nonuniform: a per-sample mesh
        pos = self.pos if self.uniform else self.pos[index]
        pos_fine = self.pos_fine if self.uniform else self.pos_fine[index]
        if self.online_features:
            # compute featurization on the fly (reference ft.py:325-352)
            edge, mass = self.get_edge(pos[:, 0])
        elif self.return_edge:
            edge = self.edge_features[index]
            mass = self.mass_features[index]
        else:
            edge = np.array([1.0], dtype=np.float32)
            mass = np.array([1.0], dtype=np.float32)
        return dict(node=self.node_features[index],
                    pos=pos,
                    grid=pos if self.super_resolution < 2 else pos_fine,
                    edge=edge,
                    mass=mass,
                    target=self.target[index])
