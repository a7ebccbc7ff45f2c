"""ctypes bindings for the native C++ P1-FEM assembly engine.

Falls back silently to the scipy path (ops.fem.assemble_p1) when the
shared library hasn't been built; `build()` compiles it on demand with the
repo's Makefile.  The mesh-dependent CSR pattern is planned once and
reused across all samples — per-sample assembly is a flat scatter-add,
parallelized over samples with native threads.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
from scipy import sparse

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfem_assembly.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library (idempotent).  Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fem_plan_build.restype = ctypes.c_void_p
    lib.fem_plan_build.argtypes = [i32p, f64p, f64p, ctypes.c_int64,
                                   ctypes.c_int64]
    lib.fem_plan_nnz.restype = ctypes.c_int64
    lib.fem_plan_nnz.argtypes = [ctypes.c_void_p]
    lib.fem_plan_pattern.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.fem_plan_free.argtypes = [ctypes.c_void_p]
    lib.fem_assemble_batch.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_int64, f64p, f64p, f64p,
        ctypes.c_int32, ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class FemPlan:
    """Reusable assembly plan for a fixed triangulation."""

    def __init__(self, nodes: np.ndarray, elems: np.ndarray):
        from .fem import p1_gradients
        lib = _load()
        if lib is None:
            raise RuntimeError("native fem_assembly library unavailable")
        self._lib = lib
        dlam, area = p1_gradients(nodes, elems)
        elems32 = np.ascontiguousarray(elems, dtype=np.int32)
        dlam = np.ascontiguousarray(dlam, dtype=np.float64)
        area = np.ascontiguousarray(area, dtype=np.float64)
        self.n_nodes = len(nodes)
        self.n_elem = len(elems)
        self._plan = lib.fem_plan_build(
            elems32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dlam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            area.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.n_elem, self.n_nodes)
        self.nnz = lib.fem_plan_nnz(self._plan)
        self.indptr = np.empty(self.n_nodes + 1, np.int64)
        self.indices = np.empty(self.nnz, np.int64)
        lib.fem_plan_pattern(
            self._plan,
            self.indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def __del__(self):
        if getattr(self, "_plan", None) and self._lib is not None:
            self._lib.fem_plan_free(self._plan)
            self._plan = None

    def assemble_batch(self, coeff_elem: np.ndarray, normalize: bool = True,
                       n_threads: Optional[int] = None):
        """coeff_elem: (n_samples, n_elem).  Returns (A_list, L, M) with
        A_list a list of per-sample normalized CSR stiffness matrices and
        L/M the shared Laplacian/mass CSR matrices."""
        coeff_elem = np.ascontiguousarray(coeff_elem, dtype=np.float64)
        n_samples = coeff_elem.shape[0]
        a_vals = np.empty((n_samples, self.nnz), np.float64)
        l_vals = np.empty(self.nnz, np.float64)
        m_vals = np.empty(self.nnz, np.float64)
        nt = n_threads or min(os.cpu_count() or 1, 16)
        f64p = ctypes.POINTER(ctypes.c_double)
        self._lib.fem_assemble_batch(
            self._plan, coeff_elem.ctypes.data_as(f64p), n_samples,
            a_vals.ctypes.data_as(f64p), l_vals.ctypes.data_as(f64p),
            m_vals.ctypes.data_as(f64p), int(normalize), nt)
        shape = (self.n_nodes, self.n_nodes)
        mk = lambda vals: sparse.csr_matrix(
            (vals, self.indices.copy(), self.indptr.copy()), shape=shape)
        a_list = [mk(a_vals[i]) for i in range(n_samples)]
        return a_list, mk(l_vals), mk(m_vals)
