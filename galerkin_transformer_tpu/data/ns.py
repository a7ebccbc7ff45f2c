"""Navier–Stokes (2+1)D dataset (reference: libs/ns_lite.py:14-106).

Loads ns_V1000_N5000_T50.mat ('u' transposed) when present; otherwise runs
the pseudo-spectral solver in `data.synthetic.navier_stokes_spectral`.
Time axis split: input window [0, T_in), target [T_in, T_in + T_out).
"""
from __future__ import annotations

import os

import numpy as np

from ..utils.timing import timer


class NavierStokesDatasetLite:
    def __init__(self, data_path: str | None = None,
                 train_data: bool = True,
                 train_len: int = 1024,
                 valid_len: int = 200,
                 time_steps_input: int = 10,
                 time_steps_output: int = 10,
                 n_grid: int = 64,
                 n_samples_synthetic: int = 16,
                 random_state: int = 1127802):
        self.data_path = data_path
        self.n_grid = n_grid
        self.h = 1.0 / n_grid
        self.train_data = train_data
        self.time_steps_input = time_steps_input
        self.time_steps_output = time_steps_output
        self.train_len = train_len
        self.valid_len = valid_len
        self.n_samples_synthetic = n_samples_synthetic
        self.random_state = random_state
        self._initialize()

    def __len__(self):
        return self.n_samples

    def _load(self):
        if self.data_path is not None and os.path.exists(self.data_path):
            import h5py
            with timer(f"Loading {os.path.basename(self.data_path)}"):
                with h5py.File(self.data_path, mode="r") as data:
                    x = np.transpose(data["u"])
            return x
        from ..utils.config import DATA_PATH
        from .synthetic import navier_stokes_spectral
        seed = self.random_state + (0 if self.train_data else 7)
        n_rec = self.time_steps_input + self.time_steps_output
        # device (jax PRNG) and host (numpy PRNG) generators draw different
        # streams from the same seed — the cache name carries a generator
        # tag so one filename never denotes two datasets
        work = self.n_samples_synthetic * self.n_grid ** 2
        use_device = work > 16 * 64 ** 2

        def cache_path(tag):
            return os.path.join(
                DATA_PATH,
                f"ns_synth_n{self.n_grid}_s{self.n_samples_synthetic}"
                f"_t{n_rec}{tag}_seed{seed}.npz")

        cache = cache_path("_jax" if use_device else "")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return z["u"]
        if use_device:
            # large workload: device pseudo-spectral solver (512 trajectories
            # of 20 s simulated in ~206 s on one v5e vs hours on this host)
            try:
                from .synthetic_jax import navier_stokes_spectral_jax
                with timer(f"Generating {self.n_samples_synthetic} NS "
                           f"trajectories at {self.n_grid}² (device)"):
                    u = navier_stokes_spectral_jax(
                        self.n_samples_synthetic, self.n_grid,
                        n_steps_record=n_rec, seed=seed)
            except Exception as e:  # no usable accelerator — host fallback
                print(f"device NS generation unavailable ({e!r}); "
                      "falling back to host spectral solver")
                cache = cache_path("")
                u = navier_stokes_spectral(self.n_samples_synthetic,
                                           self.n_grid, n_steps_record=n_rec,
                                           seed=seed)
        else:
            u = navier_stokes_spectral(self.n_samples_synthetic, self.n_grid,
                                       n_steps_record=n_rec, seed=seed)
        try:
            os.makedirs(DATA_PATH, exist_ok=True)
            np.savez_compressed(cache, u=u)
        except OSError:
            pass
        return u

    def _initialize(self):
        x = self._load()
        self.n_grid = x.shape[1]
        self.h = 1.0 / self.n_grid
        t_in, t_out = self.time_steps_input, self.time_steps_output
        a = x[..., :t_in]
        u = x[..., t_in: t_in + t_out]
        if self.data_path is not None and os.path.exists(self.data_path):
            if self.train_data:
                a, u = a[: self.train_len], u[: self.train_len]
            else:
                a, u = a[-self.valid_len:], u[-self.valid_len:]
        self.n_samples = len(a)

        gx, gy = self.central_diff(u, self.h)
        self.target_grad = np.stack([gx, gy], axis=-2).astype(np.float32)
        self.nodes = a.astype(np.float32)
        self.target = u.astype(np.float32)

        xs = np.linspace(0, 1, self.n_grid)
        xg, yg = np.meshgrid(xs, xs)
        self.grid = np.stack([xg, yg], axis=-1).astype(np.float32)
        self.pos = np.c_[xg.ravel(), yg.ravel()].astype(np.float32)

    @staticmethod
    def central_diff(x, h, padding=True):
        # x: (N, n, n, t)
        if padding:
            x = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0)
        d, s = 2, 1
        grad_x = (x[:, d:, s:-s] - x[:, :-d, s:-s]) / d
        grad_y = (x[:, s:-s, d:] - x[:, s:-s, :-d]) / d
        return grad_x / h, grad_y / h

    def __getitem__(self, idx: int) -> dict:
        return dict(node=self.nodes[idx],
                    pos=self.pos,
                    grid=self.grid,
                    target=self.target[idx],
                    target_grad=self.target_grad[idx])
