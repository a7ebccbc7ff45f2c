// Native P1-FEM featurization engine for the data pipeline.
//
// Batched assembly of P1 stiffness (coefficient-weighted), Laplacian and
// mass matrices on a fixed triangulation, with symmetric D^{-1/2}
// normalization — the per-sample host-side work DarcyDataset.get_edge does
// (reference: libs/ft.py:729-786, re-designed; the reference assembles via
// 9 python-level CSR additions per sample).
//
// The mesh is fixed across samples, so the CSR sparsity pattern is built
// ONCE; per-sample assembly is a flat scatter-add into preallocated value
// arrays, parallelized over samples with std::thread.
//
// C ABI (ctypes):
//   fem_plan_build   — build the shared CSR pattern from elems
//   fem_plan_nnz     — number of stored entries
//   fem_assemble_batch — per-sample A (coeff-weighted) and L values,
//                        normalized; M values (coeff-independent) once.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfem_assembly.so fem_assembly.cpp -lpthread
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <thread>
#include <algorithm>

extern "C" {

struct FemPlan {
  int64_t n_nodes = 0;
  int64_t n_elem = 0;
  std::vector<int64_t> indptr;    // CSR row pointers (n_nodes + 1)
  std::vector<int64_t> indices;   // CSR column indices (nnz)
  // scatter map: for each (elem, i, j) the destination slot in values
  std::vector<int64_t> slot;      // n_elem * 9
  std::vector<double> lap_local;  // n_elem * 9: area * (Dphi_i . Dphi_j)
  std::vector<double> mass_local; // n_elem * 9: area * ((i==j)+1)/12
  std::vector<int32_t> elems;     // n_elem * 3
};

// Build the CSR pattern + local matrices once per mesh.
// elems: (n_elem, 3) int32; dlambda: (n_elem, 2, 3) f64; area: (n_elem,) f64
void* fem_plan_build(const int32_t* elems, const double* dlambda,
                     const double* area, int64_t n_elem, int64_t n_nodes) {
  auto* plan = new FemPlan();
  plan->n_nodes = n_nodes;
  plan->n_elem = n_elem;
  plan->elems.assign(elems, elems + n_elem * 3);

  // count entries per row (with duplicates merged via sort-unique per row)
  std::vector<std::vector<int64_t>> row_cols(n_nodes);
  for (int64_t e = 0; e < n_elem; ++e) {
    for (int i = 0; i < 3; ++i) {
      for (int j = 0; j < 3; ++j) {
        row_cols[elems[e * 3 + i]].push_back(elems[e * 3 + j]);
      }
    }
  }
  plan->indptr.assign(n_nodes + 1, 0);
  for (int64_t r = 0; r < n_nodes; ++r) {
    auto& cols = row_cols[r];
    std::sort(cols.begin(), cols.end());
    cols.erase(std::unique(cols.begin(), cols.end()), cols.end());
    plan->indptr[r + 1] = plan->indptr[r] + (int64_t)cols.size();
  }
  plan->indices.resize(plan->indptr[n_nodes]);
  for (int64_t r = 0; r < n_nodes; ++r) {
    std::copy(row_cols[r].begin(), row_cols[r].end(),
              plan->indices.begin() + plan->indptr[r]);
  }

  // scatter slots + local matrices
  plan->slot.resize(n_elem * 9);
  plan->lap_local.resize(n_elem * 9);
  plan->mass_local.resize(n_elem * 9);
  for (int64_t e = 0; e < n_elem; ++e) {
    const double a = area[e];
    for (int i = 0; i < 3; ++i) {
      const int64_t ri = elems[e * 3 + i];
      for (int j = 0; j < 3; ++j) {
        const int64_t cj = elems[e * 3 + j];
        const int64_t lo = plan->indptr[ri];
        const int64_t hi = plan->indptr[ri + 1];
        const auto it = std::lower_bound(plan->indices.begin() + lo,
                                         plan->indices.begin() + hi, cj);
        plan->slot[e * 9 + i * 3 + j] = it - plan->indices.begin();
        // Dlambda layout: (n_elem, 2, 3): d-th component of grad phi_i
        const double gx_i = dlambda[e * 6 + 0 * 3 + i];
        const double gy_i = dlambda[e * 6 + 1 * 3 + i];
        const double gx_j = dlambda[e * 6 + 0 * 3 + j];
        const double gy_j = dlambda[e * 6 + 1 * 3 + j];
        plan->lap_local[e * 9 + i * 3 + j] = a * (gx_i * gx_j + gy_i * gy_j);
        plan->mass_local[e * 9 + i * 3 + j] = a * ((i == j) + 1) / 12.0;
      }
    }
  }
  return plan;
}

int64_t fem_plan_nnz(void* plan_ptr) {
  return static_cast<FemPlan*>(plan_ptr)->indices.size();
}

void fem_plan_pattern(void* plan_ptr, int64_t* indptr, int64_t* indices) {
  auto* plan = static_cast<FemPlan*>(plan_ptr);
  std::copy(plan->indptr.begin(), plan->indptr.end(), indptr);
  std::copy(plan->indices.begin(), plan->indices.end(), indices);
}

void fem_plan_free(void* plan_ptr) {
  delete static_cast<FemPlan*>(plan_ptr);
}

static void normalize_csr(const FemPlan& plan, double* vals) {
  const int64_t n = plan.n_nodes;
  std::vector<double> dinv(n);
  for (int64_t r = 0; r < n; ++r) {
    double diag = 0.0;
    for (int64_t s = plan.indptr[r]; s < plan.indptr[r + 1]; ++s) {
      if (plan.indices[s] == r) { diag = vals[s]; break; }
    }
    dinv[r] = diag > 0 ? 1.0 / std::sqrt(diag) : 0.0;
  }
  for (int64_t r = 0; r < n; ++r) {
    for (int64_t s = plan.indptr[r]; s < plan.indptr[r + 1]; ++s) {
      vals[s] *= dinv[r] * dinv[plan.indices[s]];
    }
  }
}

// coeff_elem: (n_samples, n_elem) f64 — per-element diffusion coefficient.
// Outputs (preallocated by caller):
//   a_vals  (n_samples, nnz) — normalized coefficient-weighted stiffness
//   l_vals  (nnz,)           — normalized Laplacian (coeff-independent)
//   m_vals  (nnz,)           — mass matrix values
void fem_assemble_batch(void* plan_ptr, const double* coeff_elem,
                        int64_t n_samples, double* a_vals, double* l_vals,
                        double* m_vals, int32_t normalize, int32_t n_threads) {
  auto* plan = static_cast<FemPlan*>(plan_ptr);
  const int64_t nnz = plan->indices.size();
  const int64_t n_elem = plan->n_elem;

  // Laplacian + mass once (coefficient-independent)
  std::memset(l_vals, 0, nnz * sizeof(double));
  std::memset(m_vals, 0, nnz * sizeof(double));
  for (int64_t e = 0; e < n_elem; ++e) {
    for (int k = 0; k < 9; ++k) {
      l_vals[plan->slot[e * 9 + k]] += plan->lap_local[e * 9 + k];
      m_vals[plan->slot[e * 9 + k]] += plan->mass_local[e * 9 + k];
    }
  }
  if (normalize) normalize_csr(*plan, l_vals);

  const int nt = std::max(1, (int)n_threads);
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t s = lo; s < hi; ++s) {
      double* av = a_vals + s * nnz;
      std::memset(av, 0, nnz * sizeof(double));
      const double* ce = coeff_elem + s * n_elem;
      for (int64_t e = 0; e < n_elem; ++e) {
        const double c = ce[e];
        for (int k = 0; k < 9; ++k) {
          av[plan->slot[e * 9 + k]] += c * plan->lap_local[e * 9 + k];
        }
      }
      if (normalize) normalize_csr(*plan, av);
    }
  };
  if (nt == 1 || n_samples == 1) {
    worker(0, n_samples);
  } else {
    std::vector<std::thread> threads;
    const int64_t chunk = (n_samples + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      const int64_t lo = t * chunk;
      const int64_t hi = std::min<int64_t>(lo + chunk, n_samples);
      if (lo < hi) threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
}

}  // extern "C"
