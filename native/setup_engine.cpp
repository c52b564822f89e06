// Native setup engine: tensor-product NURBS basis/quadrature table
// generation with OpenMP-parallel element loops.
//
// This is the TPU build's native counterpart of the reference's C++
// discretization precompute (src/mimi/utils/precomputed.cpp) and its
// chunked thread pool (src/mimi/utils/n_thread_exe.hpp): the per-element
// tables that feed the XLA compute path are produced here at C++ speed for
// large meshes.  The Python layer (mimi_tpu/fem/native.py) loads this via
// ctypes and falls back to the vectorized numpy implementation when the
// shared library is unavailable.
//
// Build: g++ -O3 -fPIC -shared -fopenmp setup_engine.cpp -o libmimi_setup.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Cox-de Boor: values and first derivatives of the p+1 nonzero basis
// functions at u for span `span` (Piegl & Tiller A2.3 restricted to one
// derivative).
void ders_basis(const double* kv, int p, int span, double u, double* N,
                double* dN) {
  std::vector<double> ndu((p + 1) * (p + 1));
  std::vector<double> left(p + 1), right(p + 1);
  auto at = [&](int i, int j) -> double& { return ndu[i * (p + 1) + j]; };
  at(0, 0) = 1.0;
  for (int j = 1; j <= p; ++j) {
    left[j] = u - kv[span + 1 - j];
    right[j] = kv[span + j] - u;
    double saved = 0.0;
    for (int r = 0; r < j; ++r) {
      at(j, r) = right[r + 1] + left[j - r];
      double temp = at(r, j - 1) / at(j, r);
      at(r, j) = saved + right[r + 1] * temp;
      saved = left[j - r] * temp;
    }
    at(j, j) = saved;
  }
  for (int r = 0; r <= p; ++r) N[r] = at(r, p);
  // first derivative via the a-coefficients (n_ders = 1)
  for (int r = 0; r <= p; ++r) {
    double d = 0.0;
    int rk = r - 1, pk = p - 1;
    double a00 = 1.0;
    double a10, a11;
    if (r >= 1) {
      a10 = a00 / at(pk + 1, rk);
      d = a10 * at(rk, pk);
    }
    if (r <= pk) {
      a11 = -a00 / at(pk + 1, r);
      d += a11 * at(r, pk);
    }
    dN[r] = d * p;
  }
}

}  // namespace

extern "C" {

// Per-dimension tables for all spans: starts, param points, weights and 1D
// basis values/derivatives at Gauss points.
//
// kv:        knot vector (n_kv)
// p:         degree
// bps:       span breakpoints (n_span + 1)
// xg, wg:    Gauss points/weights on [-1, 1] (n_g)
// out_starts (n_span) int64, out_uq/out_wq (n_span*n_g),
// out_B/out_D (n_span*n_g*(p+1))
void dim_tables(const double* kv, int64_t n_kv, int64_t p, const double* bps,
                int64_t n_span, const double* xg, const double* wg,
                int64_t n_g, int64_t* out_starts, double* out_uq,
                double* out_wq, double* out_B, double* out_D) {
  const int n_basis = (int)(n_kv - p - 1);
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < n_span; ++s) {
    const double a = bps[s], b = bps[s + 1];
    const double half = 0.5 * (b - a), mid = 0.5 * (a + b);
    // find_span at midpoint
    int lo = (int)p, hi = n_basis;
    if (mid >= kv[n_basis]) {
      lo = n_basis - 1;
    } else if (mid > kv[p]) {
      while (hi - lo > 1) {
        int m = (lo + hi) / 2;
        if (mid < kv[m])
          hi = m;
        else
          lo = m;
      }
    }
    const int span = lo;
    out_starts[s] = span - p;
    for (int64_t g = 0; g < n_g; ++g) {
      const double u = mid + half * xg[g];
      out_uq[s * n_g + g] = u;
      out_wq[s * n_g + g] = wg[g] * half;
      ders_basis(kv, (int)p, span, u, &out_B[(s * n_g + g) * (p + 1)],
                 &out_D[(s * n_g + g) * (p + 1)]);
    }
  }
}

// Full tensor-product table generation over the element batch (2D/3D).
//
// For each element e (lexicographic over spans, dim-0 fastest) and quad
// point q (dim-0 fastest) computes connectivity, rational basis values and
// parametric derivatives:
//   conn (n_el, n_dof)  N (n_el, n_q, n_dof)
//   dN   (n_el, n_q, n_dof, d)   wq (n_el, n_q)
// Inputs per dim: starts/B/D/w tables from dim_tables, pp1 = p+1,
// weights_flat = control weights in lexicographic order.
void tensor_tables(int64_t d, const int64_t* spans, const int64_t* n_g,
                   const int64_t* pp1, const int64_t* n_ctrl,
                   const int64_t* const* starts, const double* const* Bt,
                   const double* const* Dt, const double* const* wqt,
                   const double* weights_flat, int64_t* conn, double* N,
                   double* dN, double* WQ) {
  int64_t n_el = 1, n_q = 1, n_dof = 1;
  int64_t mults[3] = {1, 1, 1};
  for (int64_t k = 0; k < d; ++k) {
    n_el *= spans[k];
    n_q *= n_g[k];
    n_dof *= pp1[k];
    if (k > 0) mults[k] = mults[k - 1] * n_ctrl[k - 1];
  }

#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < n_el; ++e) {
    int64_t s_idx[3] = {0, 0, 0};
    {
      int64_t rem = e;
      for (int64_t k = 0; k < d; ++k) {
        s_idx[k] = rem % spans[k];
        rem /= spans[k];
      }
    }
    // connectivity
    for (int64_t n = 0; n < n_dof; ++n) {
      int64_t a_idx[3] = {0, 0, 0};
      int64_t rem = n;
      for (int64_t k = 0; k < d; ++k) {
        a_idx[k] = rem % pp1[k];
        rem /= pp1[k];
      }
      int64_t g = 0;
      for (int64_t k = 0; k < d; ++k)
        g += (starts[k][s_idx[k]] + a_idx[k]) * mults[k];
      conn[e * n_dof + n] = g;
    }
    // quad loop
    for (int64_t q = 0; q < n_q; ++q) {
      int64_t g_idx[3] = {0, 0, 0};
      {
        int64_t rem = q;
        for (int64_t k = 0; k < d; ++k) {
          g_idx[k] = rem % n_g[k];
          rem /= n_g[k];
        }
      }
      double wq = 1.0;
      for (int64_t k = 0; k < d; ++k)
        wq *= wqt[k][s_idx[k] * n_g[k] + g_idx[k]];
      WQ[e * n_q + q] = wq;

      // tensor basis + weights -> rational correction
      double* Nout = &N[(e * n_q + q) * n_dof];
      double* dNout = &dN[((e * n_q + q) * n_dof) * d];
      double W = 0.0, Wd[3] = {0, 0, 0};
      for (int64_t n = 0; n < n_dof; ++n) {
        int64_t a_idx[3] = {0, 0, 0};
        int64_t rem = n;
        for (int64_t k = 0; k < d; ++k) {
          a_idx[k] = rem % pp1[k];
          rem /= pp1[k];
        }
        double b = 1.0, der[3];
        for (int64_t k = 0; k < d; ++k) {
          const double Bv =
              Bt[k][(s_idx[k] * n_g[k] + g_idx[k]) * pp1[k] + a_idx[k]];
          b *= Bv;
        }
        for (int64_t kd = 0; kd < d; ++kd) {
          double v = 1.0;
          for (int64_t k = 0; k < d; ++k) {
            const int64_t off =
                (s_idx[k] * n_g[k] + g_idx[k]) * pp1[k] + a_idx[k];
            v *= (k == kd) ? Dt[k][off] : Bt[k][off];
          }
          der[kd] = v;
        }
        const double w = weights_flat[conn[e * n_dof + n]];
        Nout[n] = w * b;
        W += Nout[n];
        for (int64_t kd = 0; kd < d; ++kd) {
          dNout[n * d + kd] = w * der[kd];
          Wd[kd] += dNout[n * d + kd];
        }
      }
      const double Winv = 1.0 / W;
      for (int64_t n = 0; n < n_dof; ++n) {
        Nout[n] *= Winv;
        for (int64_t kd = 0; kd < d; ++kd)
          dNout[n * d + kd] =
              (dNout[n * d + kd] - Nout[n] * Wd[kd]) * Winv;
      }
    }
  }
}

int omp_thread_count() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

extern "C" {

// Geometry stage: from parametric derivatives to physical ones.
//   J = dX/du (dim x dim), detJ, dN/dX = dN/du * J^{-1}
//   w_detJ = wq * detJ
// x_ref: (n_ctrl_total, dim) lexicographic control points.
void geometry_tables(int64_t n_el, int64_t n_q, int64_t n_dof, int64_t dim,
                     const int64_t* conn, const double* dN_du,
                     const double* wq, const double* x_ref, double* dN_dX,
                     double* w_detJ) {
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < n_el; ++e) {
    // gather element coordinates
    double xe[64 * 3];
    for (int64_t n = 0; n < n_dof; ++n)
      for (int64_t c = 0; c < dim; ++c)
        xe[n * dim + c] = x_ref[conn[e * n_dof + n] * dim + c];
    for (int64_t q = 0; q < n_q; ++q) {
      const double* dn = &dN_du[((e * n_q + q) * n_dof) * dim];
      double J[9] = {0};
      for (int64_t n = 0; n < n_dof; ++n)
        for (int64_t d = 0; d < dim; ++d)
          for (int64_t k = 0; k < dim; ++k)
            J[d * dim + k] += xe[n * dim + d] * dn[n * dim + k];
      double det, Jinv[9];
      if (dim == 2) {
        det = J[0] * J[3] - J[1] * J[2];
        const double inv = 1.0 / det;
        Jinv[0] = J[3] * inv;
        Jinv[1] = -J[1] * inv;
        Jinv[2] = -J[2] * inv;
        Jinv[3] = J[0] * inv;
      } else {
        det = J[0] * (J[4] * J[8] - J[5] * J[7]) -
              J[1] * (J[3] * J[8] - J[5] * J[6]) +
              J[2] * (J[3] * J[7] - J[4] * J[6]);
        const double inv = 1.0 / det;
        Jinv[0] = (J[4] * J[8] - J[5] * J[7]) * inv;
        Jinv[1] = (J[2] * J[7] - J[1] * J[8]) * inv;
        Jinv[2] = (J[1] * J[5] - J[2] * J[4]) * inv;
        Jinv[3] = (J[5] * J[6] - J[3] * J[8]) * inv;
        Jinv[4] = (J[0] * J[8] - J[2] * J[6]) * inv;
        Jinv[5] = (J[2] * J[3] - J[0] * J[5]) * inv;
        Jinv[6] = (J[3] * J[7] - J[4] * J[6]) * inv;
        Jinv[7] = (J[1] * J[6] - J[0] * J[7]) * inv;
        Jinv[8] = (J[0] * J[4] - J[1] * J[3]) * inv;
      }
      w_detJ[e * n_q + q] = wq[e * n_q + q] * det;
      double* out = &dN_dX[((e * n_q + q) * n_dof) * dim];
      for (int64_t n = 0; n < n_dof; ++n)
        for (int64_t d = 0; d < dim; ++d) {
          double acc = 0.0;
          for (int64_t k = 0; k < dim; ++k)
            acc += dn[n * dim + k] * Jinv[k * dim + d];
          out[n * dim + d] = acc;
        }
    }
  }
}

}  // extern "C"
