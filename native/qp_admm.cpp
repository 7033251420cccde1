// Dense ADMM QP solver with active-set polish (OSQP-equivalent, C++).
//
// Native counterpart of morbit_tpu/ops/qp.py. The Julia reference links the
// OSQP C library for its trust-region LPs (src/descent.jl:91-135, :691-758);
// this module provides the same operator splitting natively for the host
// runtime: a verification oracle for the on-device kernel and the QP engine
// of the non-jitted black-box path. Self-contained dense linear algebra
// (Cholesky / LU), no BLAS dependency; problems are tiny (n <~ 64).
//
// Problem:  min 1/2 z'Pz + q'z   s.t.  l <= Az <= u.
// Equality rows: l == u. Padded rows: l = -inf, u = +inf.

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

namespace {

using Vec = std::vector<double>;

constexpr double kInf = std::numeric_limits<double>::infinity();

// Cholesky factorization in place (lower). Returns false if not SPD.
bool cholesky(Vec& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
    if (d <= 0.0) return false;
    const double Ljj = std::sqrt(d);
    M[j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = s / Ljj;
    }
  }
  return true;
}

void cho_solve(const Vec& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

// LU with partial pivoting; A (n x n) overwritten, piv out. false if singular.
bool lu_factor(Vec& A, int n, std::vector<int>& piv) {
  piv.resize(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double amax = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      const double v = std::fabs(A[i * n + k]);
      if (v > amax) { amax = v; p = i; }
    }
    if (amax == 0.0) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
      std::swap(piv[k], piv[p]);
    }
    const double pivv = A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double f = (A[i * n + k] /= pivv);
      for (int j = k + 1; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
    }
  }
  return true;
}

void lu_solve(const Vec& LU, const std::vector<int>& piv, int n, double* b) {
  Vec x(n);
  for (int i = 0; i < n; ++i) x[i] = b[piv[i]];
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < i; ++k) x[i] -= LU[i * n + k] * x[k];
  for (int i = n - 1; i >= 0; --i) {
    for (int k = i + 1; k < n; ++k) x[i] -= LU[i * n + k] * x[k];
    x[i] /= LU[i * n + i];
  }
  std::memcpy(b, x.data(), n * sizeof(double));
}

void mat_vec(const double* A, int rows, int cols, const double* x, double* out) {
  for (int i = 0; i < rows; ++i) {
    double s = 0.0;
    for (int j = 0; j < cols; ++j) s += A[i * cols + j] * x[j];
    out[i] = s;
  }
}

void mat_t_vec(const double* A, int rows, int cols, const double* x, double* out) {
  for (int j = 0; j < cols; ++j) out[j] = 0.0;
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) out[j] += A[i * cols + j] * x[i];
}

struct Residuals { double prim, dual; };

Residuals residuals(int n, int m, const double* P, const double* q,
                    const double* A, const double* l, const double* u,
                    const double* z, const double* y) {
  Vec Az(m), Pz(n), Aty(n);
  mat_vec(A, m, n, z, Az.data());
  mat_vec(P, n, n, z, Pz.data());
  mat_t_vec(A, m, n, y, Aty.data());
  double pr = 0.0, dr = 0.0;
  for (int i = 0; i < m; ++i) {
    double v = 0.0;
    if (Az[i] > u[i]) v = Az[i] - u[i];
    if (Az[i] < l[i]) v = std::max(v, l[i] - Az[i]);
    pr = std::max(pr, v);
  }
  for (int j = 0; j < n; ++j)
    dr = std::max(dr, std::fabs(Pz[j] + q[j] + Aty[j]));
  return {pr, dr};
}

void polish(int n, int m, const double* P, const double* q, const double* A,
            const double* l, const double* u, Vec& z, Vec& y) {
  const double delta = 1e-8;
  Vec Az(m);
  mat_vec(A, m, n, z.data(), Az.data());
  std::vector<double> act(m), b_act(m);
  for (int i = 0; i < m; ++i) {
    const double gap = u[i] - l[i];
    const bool is_eq = gap <= 1e-12;
    const double tol = 1e-6 * (1.0 + std::fabs(Az[i]));
    const bool low = (y[i] < -1e-10) || (Az[i] <= l[i] + tol);
    const bool upp = (y[i] > 1e-10) || (Az[i] >= u[i] - tol);
    const bool a = is_eq || (low && std::isfinite(l[i])) ||
                   (upp && std::isfinite(u[i]));
    act[i] = a ? 1.0 : 0.0;
    double b = is_eq ? l[i] : ((upp && std::isfinite(u[i])) ? u[i] : l[i]);
    b_act[i] = std::isfinite(b) ? b : 0.0;
  }
  const int N = n + m;
  Vec K(N * N, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) K[i * N + j] = P[i * n + j];
  for (int i = 0; i < n; ++i) K[i * N + i] += delta;
  for (int r = 0; r < m; ++r) {
    for (int j = 0; j < n; ++j) {
      const double v = act[r] * A[r * n + j];
      K[(n + r) * N + j] = v;
      K[j * N + (n + r)] = v;
    }
    K[(n + r) * N + (n + r)] = -(delta * act[r] + (1.0 - act[r]));
  }
  Vec rhs(N);
  for (int j = 0; j < n; ++j) rhs[j] = -q[j];
  for (int r = 0; r < m; ++r) rhs[n + r] = act[r] * b_act[r];

  Vec LU = K;
  std::vector<int> piv;
  if (!lu_factor(LU, N, piv)) return;
  Vec sol = rhs;
  lu_solve(LU, piv, N, sol.data());

  // iterative refinement against the unregularized operator
  for (int it = 0; it < 3; ++it) {
    Vec r(N, 0.0);
    // r = rhs - K0 sol  with K0 = K without the delta terms
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += P[i * n + j] * sol[j];
      for (int rr = 0; rr < m; ++rr) s += act[rr] * A[rr * n + i] * sol[n + rr];
      r[i] = rhs[i] - s;
    }
    for (int rr = 0; rr < m; ++rr) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += act[rr] * A[rr * n + j] * sol[j];
      s -= (1.0 - act[rr]) * sol[n + rr];
      r[n + rr] = rhs[n + rr] - s;
    }
    lu_solve(LU, piv, N, r.data());
    for (int i = 0; i < N; ++i) sol[i] += r[i];
  }

  Vec z_pol(sol.begin(), sol.begin() + n);
  Vec y_pol(m);
  for (int r = 0; r < m; ++r) y_pol[r] = act[r] * sol[n + r];

  const Residuals before = residuals(n, m, P, q, A, l, u, z.data(), y.data());
  const Residuals after = residuals(n, m, P, q, A, l, u, z_pol.data(), y_pol.data());
  bool finite = true;
  for (int i = 0; i < n; ++i) finite &= std::isfinite(z_pol[i]);
  if (finite && after.prim + after.dual <= before.prim + before.dual) {
    z = z_pol;
    y = y_pol;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 if residuals stayed above tolerance.
// info_out: [obj, prim_res, dual_res]
int qp_solve(int n, int m, const double* P, const double* q, const double* A,
             const double* l, const double* u, int iters, double rho0,
             double sigma, double alpha, int do_polish, double* z_out,
             double* y_out, double* info_out) {
  Vec rho(m);
  for (int i = 0; i < m; ++i) {
    const bool loose = std::isinf(l[i]) && std::isinf(u[i]);
    const bool eq = (u[i] - l[i]) <= 1e-12;
    rho[i] = loose ? rho0 * 1e-6 : (eq ? rho0 * 1e3 : rho0);
  }

  Vec z(n, 0.0), zz(m, 0.0), y(m, 0.0);
  for (int i = 0; i < m; ++i) zz[i] = std::fmin(std::fmax(0.0, l[i]), u[i]);

  const int adapt_every = 100;
  const int stages = std::max(1, iters / adapt_every);

  Vec M(n * n), rhs(n), xt(n), zt(m), tmp_m(m);
  for (int s = 0; s < stages; ++s) {
    // M = P + sigma I + A' diag(rho) A
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) M[i * n + j] = P[i * n + j];
    for (int i = 0; i < n; ++i) M[i * n + i] += sigma;
    for (int r = 0; r < m; ++r)
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
          M[i * n + j] += rho[r] * A[r * n + i] * A[r * n + j];
    if (!cholesky(M, n)) return 2;

    for (int it = 0; it < adapt_every; ++it) {
      for (int i = 0; i < m; ++i) tmp_m[i] = rho[i] * zz[i] - y[i];
      mat_t_vec(A, m, n, tmp_m.data(), rhs.data());
      for (int j = 0; j < n; ++j) rhs[j] += sigma * z[j] - q[j];
      std::memcpy(xt.data(), rhs.data(), n * sizeof(double));
      cho_solve(M, n, xt.data());
      mat_vec(A, m, n, xt.data(), zt.data());
      for (int j = 0; j < n; ++j) z[j] = alpha * xt[j] + (1 - alpha) * z[j];
      for (int i = 0; i < m; ++i) {
        const double zz_arg = alpha * zt[i] + (1 - alpha) * zz[i] + y[i] / rho[i];
        const double zz_new = std::fmin(std::fmax(zz_arg, l[i]), u[i]);
        y[i] += rho[i] * (alpha * zt[i] + (1 - alpha) * zz[i] - zz_new);
        zz[i] = zz_new;
      }
    }

    const Residuals r = residuals(n, m, P, q, A, l, u, z.data(), y.data());
    double scale = std::sqrt(std::max(r.prim, 1e-30) / std::max(r.dual, 1e-30));
    scale = std::fmin(std::fmax(scale, 0.1), 10.0);
    for (int i = 0; i < m; ++i)
      rho[i] = std::fmin(std::fmax(rho[i] * scale, 1e-6), 1e6);
  }

  if (do_polish) polish(n, m, P, q, A, l, u, z, y);

  const Residuals r = residuals(n, m, P, q, A, l, u, z.data(), y.data());
  double obj = 0.0;
  Vec Pz(n);
  mat_vec(P, n, n, z.data(), Pz.data());
  for (int j = 0; j < n; ++j) obj += 0.5 * z[j] * Pz[j] + q[j] * z[j];

  std::memcpy(z_out, z.data(), n * sizeof(double));
  std::memcpy(y_out, y.data(), m * sizeof(double));
  info_out[0] = obj;
  info_out[1] = r.prim;
  info_out[2] = r.dual;
  return r.prim <= 1e-6 ? 0 : 1;
}

// Batched entry point: B independent problems with identical shapes.
int qp_solve_batch(int B, int n, int m, const double* P, const double* q,
                   const double* A, const double* l, const double* u,
                   int iters, double rho0, double sigma, double alpha,
                   int do_polish, double* z_out, double* y_out,
                   double* info_out) {
  int worst = 0;
  for (int b = 0; b < B; ++b) {
    const int rc = qp_solve(n, m, P + b * n * n, q + b * n, A + b * m * n,
                            l + b * m, u + b * m, iters, rho0, sigma, alpha,
                            do_polish, z_out + b * n, y_out + b * m,
                            info_out + b * 3);
    worst = std::max(worst, rc);
  }
  return worst;
}

}  // extern "C"
