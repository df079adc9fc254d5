// Native canonicalization kernels — the C++ core of the symbolic front end
// (the role cvxcore's C++ backend plays for CVXPY in the reference stack;
// cvxpylayers SURVEY section 2.2 "CVXPY" row).
//
// Exposed as a plain-C ABI consumed through ctypes (no pybind11 in the
// image). All kernels are allocation-free two-phase (count, then fill into
// caller-provided buffers) so numpy owns every array.
//
// Kernels:
//   join_count / join_fill: sparse inner join on int64 keys — the workhorse
//     of parameter-affine products (TensorRep._join_product) and quadratic
//     extraction (V'V, V'c joins).
//   coo_matmat_count / coo_matmat_fill: contraction of a CSR linear map with
//     entry lists (apply_linear) without materializing scipy temporaries.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// Inner join: all index pairs (ia, ib) with ka[ia] == kb[ib].
// Phase 1: sort kb (indices), count matches per a-entry. Returns total pairs.
// The sorted permutation and per-a counts are written for phase 2.
// --------------------------------------------------------------------------

int64_t join_count(const int64_t* ka, int64_t na,
                   const int64_t* kb, int64_t nb,
                   int64_t* kb_order,     // out: argsort of kb (size nb)
                   int64_t* a_counts) {   // out: matches per a entry (size na)
  std::vector<int64_t> order(nb);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t i, int64_t j) { return kb[i] < kb[j]; });
  std::vector<int64_t> sorted(nb);
  for (int64_t i = 0; i < nb; ++i) sorted[i] = kb[order[i]];
  std::memcpy(kb_order, order.data(), nb * sizeof(int64_t));

  int64_t total = 0;
  for (int64_t i = 0; i < na; ++i) {
    auto lo = std::lower_bound(sorted.begin(), sorted.end(), ka[i]);
    auto hi = std::upper_bound(lo, sorted.end(), ka[i]);
    a_counts[i] = hi - lo;
    total += a_counts[i];
  }
  return total;
}

void join_fill(const int64_t* ka, int64_t na,
               const int64_t* kb_sorted_keys,  // kb reordered by kb_order
               int64_t nb,
               const int64_t* kb_order,
               int64_t* out_ia,   // size total
               int64_t* out_ib) { // size total
  int64_t pos = 0;
  for (int64_t i = 0; i < na; ++i) {
    const int64_t* base = kb_sorted_keys;
    auto lo = std::lower_bound(base, base + nb, ka[i]);
    auto hi = std::upper_bound(lo, base + nb, ka[i]);
    for (const int64_t* it = lo; it != hi; ++it) {
      int64_t j = it - base;
      out_ia[pos] = i;
      out_ib[pos] = kb_order[j];
      ++pos;
    }
  }
}

// --------------------------------------------------------------------------
// apply_linear: out entries = { (Li, var[k], par[k], Lv * val[k]) :
//   L[Li, rows[k]] != 0 }. L given in CSC over columns = input rows, so each
// entry k joins against the column rows[k] of L.
// --------------------------------------------------------------------------

int64_t coo_matmat_count(const int64_t* entry_rows, int64_t nnz,
                         const int64_t* L_indptr /* size n_in+1 */,
                         int64_t n_in) {
  int64_t total = 0;
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t c = entry_rows[k];
    if (c >= 0 && c < n_in) total += L_indptr[c + 1] - L_indptr[c];
  }
  return total;
}

void coo_matmat_fill(const int64_t* entry_rows,
                     const int64_t* entry_vars,
                     const int64_t* entry_pars,
                     const double* entry_vals, int64_t nnz,
                     const int64_t* L_indptr,
                     const int64_t* L_indices,  // row index within output
                     const double* L_data,
                     int64_t n_in,
                     int64_t* out_rows, int64_t* out_vars,
                     int64_t* out_pars, double* out_vals) {
  int64_t pos = 0;
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t c = entry_rows[k];
    if (c < 0 || c >= n_in) continue;
    for (int64_t p = L_indptr[c]; p < L_indptr[c + 1]; ++p) {
      out_rows[pos] = L_indices[p];
      out_vars[pos] = entry_vars[k];
      out_pars[pos] = entry_pars[k];
      out_vals[pos] = L_data[p] * entry_vals[k];
      ++pos;
    }
  }
}

}  // extern "C"
