"""Burgers dataset (reference: libs/ft.py:24-371).

Numpy-native re-design of the reference dataset: same split logic, uniform
subsampling, periodic central-difference target derivatives, zero-shot
super-resolution support, and optional FEM edge features
(normalized 1D Laplacian + Krylov powers + inverse-distance + mass).

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
        if self.online_features:
            # compute featurization on the fly (reference ft.py:325-352)
            edge, mass = self.get_edge(self.pos[:, 0])
        elif self.return_edge:
            edge = self.edge_features[index]
            mass = self.mass_features[index]
        else:
            edge = np.array([1.0], dtype=np.float32)
            mass = np.array([1.0], dtype=np.float32)
        return dict(node=self.node_features[index],
                    pos=self.pos,
                    grid=self.pos if self.super_resolution < 2 else self.pos_fine,
                    edge=edge,
                    mass=mass,
                    target=self.target[index])
