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

// ---- S^z-sector-restricted Heisenberg/J1-J2 (combinadic basis) ----
//
// S^z-conserving Hamiltonians are block diagonal in n_up = popcount(b);
// the ground state of the AFM Heisenberg/J1-J2 family lives in the
// n_up = N/2 block, whose dimension C(N, N/2) is ~sqrt(N) * 2^N / 2^N
// smaller than the full Hilbert space (N=28: 40M vs 268M states) — both
// the memory AND the per-matvec work shrink by that factor. States are
// enumerated in increasing numeric order (Gosper's hack); the column
// index of a flipped state is recovered with the standard combinadic
// rank  rank(b) = sum_j C(p_j, j)  over the ascending set-bit positions
// p_1 < ... < p_k.

static uint64_t g_binom[64][64];
static bool init_binom_table() {
  for (int n = 0; n < 64; ++n) {
    g_binom[n][0] = 1;
    for (int k = 1; k <= n; ++k) {
      g_binom[n][k] =
          g_binom[n - 1][k - 1] + (k <= n - 1 ? g_binom[n - 1][k] : 0);
    }
    for (int k = n + 1; k < 64; ++k) g_binom[n][k] = 0;
  }
  return true;
}
static bool g_binom_ready = init_binom_table();

static inline int64_t sector_rank(uint64_t b) {
  int64_t r = 0;
  int j = 0;
  while (b) {
    const int p = __builtin_ctzll(b);
    ++j;
    r += int64_t(g_binom[p][j]);
    b &= b - 1;
  }
  return r;
}

// Enumerate the n_up-bit states of n_sites bits in ascending order.
void fill_sector_states(int n_sites, int n_up, uint64_t* states,
                        int64_t dim) {
  (void)n_sites;
  uint64_t v = (n_up == 0) ? 0 : ((uint64_t(1) << n_up) - 1);
  for (int64_t i = 0; i < dim; ++i) {
    states[i] = v;
    if (i + 1 == dim) break;  // don't step past the top state (and v=0
                              // for n_up=0 would divide by zero below)
    // Gosper's hack: next larger integer with the same popcount
    const uint64_t c = v & -v;
    const uint64_t r = v + c;
    v = (((r ^ v) >> 2) / c) | r;
  }
}

// Same Hamiltonian as heisenberg_matvec, restricted to the sector basis.
void heisenberg_sector_matvec(const int32_t* bonds, const double* couplings,
                              int n_bonds, const uint64_t* states,
                              int64_t dim, const double* v, double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t idx = 0; idx < dim; ++idx) {
    const uint64_t b = states[idx];
    double acc = 0.0;
    double diag = 0.0;
    for (int k = 0; k < n_bonds; ++k) {
      const int i = bonds[2 * k], jj = bonds[2 * k + 1];
      const int bi = (b >> i) & 1, bj = (b >> jj) & 1;
      if (bi == bj) {
        diag += 0.25 * couplings[k];
      } else {
        diag -= 0.25 * couplings[k];
        const uint64_t flip = (uint64_t(1) << i) | (uint64_t(1) << jj);
        acc += 0.5 * couplings[k] * v[sector_rank(b ^ flip)];
      }
    }
    out[idx] = acc + diag * v[idx];
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
