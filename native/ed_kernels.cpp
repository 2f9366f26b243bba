// Native exact-diagonalization matvec kernels (host side).
//
// The ED oracle (qmcnn_tpu/ops/exact.py) is the correctness anchor of the
// framework; its scipy-sparse path materializes H (O(2^N * n_bonds) memory)
// which caps practical N. These kernels apply H on the fly in the gather
// form out[b] = sum_b' <b|H|b'> v[b'] — race-free, OpenMP-parallel over
// basis states, zero matrix storage — pushing Lanczos to N ~ 24+.
//
// Basis convention matches exact.py: bit i of b set <=> sigma^z_i = +1.
// Exposed via ctypes (qmcnn_tpu/ops/exact_native.py); no pybind11 needed.

#include <cstdint>
#include <cstddef>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// H = -J sum_bonds sz_i sz_j - h sum_i sx_i   (sigma convention)
void tfim_matvec(int n_sites, const int32_t* bonds, int n_bonds, double j,
                 double h, const double* v, double* out) {
  const int64_t dim = int64_t(1) << n_sites;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < dim; ++b) {
    double diag = 0.0;
    for (int k = 0; k < n_bonds; ++k) {
      const int i = bonds[2 * k], jj = bonds[2 * k + 1];
      const int si = ((b >> i) & 1) ? 1 : -1;
      const int sj = ((b >> jj) & 1) ? 1 : -1;
      diag += double(si * sj);
    }
    double acc = -j * diag * v[b];
    for (int i = 0; i < n_sites; ++i) {
      acc -= h * v[b ^ (int64_t(1) << i)];
    }
    out[b] = acc;
  }
}

// H = sum_bonds J_k [ (1/4) sz_i sz_j + (1/2) exchange(anti-aligned) ]
// (spin-1/2 S = sigma/2; covers Heisenberg and J1-J2 via the bond list)
void heisenberg_matvec(int n_sites, const int32_t* bonds,
                       const double* couplings, int n_bonds, const double* v,
                       double* out) {
  const int64_t dim = int64_t(1) << n_sites;
  (void)n_sites;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < dim; ++b) {
    double acc = 0.0;
    double diag = 0.0;
    for (int k = 0; k < n_bonds; ++k) {
      const int i = bonds[2 * k], jj = bonds[2 * k + 1];
      const int bi = (b >> i) & 1, bj = (b >> jj) & 1;
      if (bi == bj) {
        diag += 0.25 * couplings[k];
      } else {
        diag -= 0.25 * couplings[k];
        const int64_t flip = (int64_t(1) << i) | (int64_t(1) << jj);
        acc += 0.5 * couplings[k] * v[b ^ flip];
      }
    }
    out[b] = acc + diag * v[b];
  }
}

int ed_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
