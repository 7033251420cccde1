"""Independent sequential oracle — FULL algorithm scope (round-4 extension).

Extends the round-3 oracle (``oracle_sequential.py``: exact models,
box/linear constraints, steepest descent) to the paths where the TPU
re-architecture risk actually lives (round-3 VERDICT missing item 1):

* **RBF surrogates** — rounds 1-3 training-set selection (greedy
  affinely-independent QR filter, ``src/models/RbfModel.jl:200-307`` /
  ``AffinelyIndependentPoints.jl``), the coordinate-axis rebuild under
  ``ensure_fully_linear``, model-improvement steps (``RbfModel.jl:699-732``),
  the plain KKT interpolation fit (``[Phi Pi; Pi' 0][w; lam] = [V; 0]``,
  the ``RadialBasisFunctionModels.jl`` analogue), and the criticality
  routine with per-pass fully-linear rebuilds (``algorithm.jl:523-613``).
* **Taylor finite-difference models** — flat stencil site grids with
  dedup-free database appends and the G/H contraction fit
  (``src/models/TaylorModel.jl:163-276``).
* **Nonlinear constraints** — MaxFilter acceptability with envelope shift
  (``AbstractFilterInterface.jl:32-71``), the normal step on surrogate
  linearizations, compatibility, and the projected-gradient restoration
  (the repo's documented COBYLA stand-in, ``algorithm.jl:325-404``) with
  its 2-passes-per-iteration counting convention.
* **Pascoletti-Serafini descent** — deterministic Halton-sweep mirror of
  the :GN_ISRES replacement with the reference default budgets
  (``descent.jl:414-432,527``).

Implementation rules identical to ``oracle_sequential.py``: plain Python
control flow, NumPy float64, ``scipy.optimize.linprog`` (HiGHS) for every
LP, no imports from ``morbit_tpu`` — masked buffers, micro-steps, fused
kernels, one-shot ladders and fixpoint fast-forwards on the production
side must reproduce THESE sequential semantics.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from scipy.optimize import linprog

SQRT_EPS_F32 = math.sqrt(2.0 ** -23)
EPS64 = 2.0 ** -52
MIN_STEPSIZE = 10 * EPS64
ARMIJO_SHRINK = 0.75
ARMIJO_C = 1e-6
MAX_LOOPS = int(math.floor(math.log(MIN_STEPSIZE) / math.log(ARMIJO_SHRINK)))

ACCEPTABLE, SUCCESSFULL, MODELIMPROVING, INACCEPTABLE, RESTORATION = 0, 1, 2, 3, 4
FILTER_FAIL, FILTER_ADD, EARLY_EXIT, INITIALIZATION = 5, 6, 7, 8
CONTINUE, MAX_ITER, BUDGET_EXHAUSTED, CRITICAL, TOLERANCE, INFEASIBLE = (
    1, 2, 3, 4, 5, 6)
RU_LEAVE, RU_GROW, RU_SHRINK, RU_SHRINK_MUCH = 0, 1, 2, 3

_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47)


# ===================================================================== Halton
def halton(count: int, dim: int, start_index: int = 1) -> np.ndarray:
    """Plain-Python Halton sequence (deterministic integer arithmetic —
    bit-identical to any correct radical-inverse implementation)."""
    out = np.empty((count, dim))
    for j in range(dim):
        b = _PRIMES[j]
        for i in range(count):
            f, r, idx = 1.0, 0.0, start_index + i
            while idx > 0:
                f /= b
                r += f * (idx % b)
                idx //= b
            out[i, j] = r
    return out


# ============================================================== QR complement
def householder_complement(Y: np.ndarray, k: int) -> np.ndarray:
    """Full Q of the unpivoted Householder QR of ``Y[:, :k]`` with LAPACK's
    sign convention, columns inf-norm normalized — the complement columns
    ``j >= k`` span the orthogonal complement exactly as Julia's ``qr(Y).Q``
    (``AffinelyIndependentPoints.jl:4-11``)."""
    n = Y.shape[0]
    Q = np.eye(n)
    A = Y.copy()
    for j in range(min(k, n)):
        x = A[:, j].copy()
        x[:j] = 0.0
        normx = math.sqrt(float(x @ x))
        if normx == 0.0:
            continue
        sgn = 1.0 if A[j, j] >= 0 else -1.0
        alpha = -sgn * normx
        v = x.copy()
        v[j] = A[j, j] - alpha
        vnorm2 = float(v @ v)
        if vnorm2 == 0.0:
            continue
        beta = 2.0 / vnorm2
        A = A - beta * np.outer(v, v @ A)
        Q = Q - beta * np.outer(Q @ v, v)
    norms = np.max(np.abs(Q), axis=0)
    return Q / np.where(norms > 0, norms, 1.0)


def affinely_independent(x0, seeds, cand_ids, pivot, n_pick, Y=None, k=0):
    """Greedy selection of up to ``n_pick`` affinely independent seeds
    (``AffinelyIndependentPointFilter``): the first accepted candidate of a
    run maximizes ``||s - x0||_inf`` unconditionally; later candidates
    maximize ``||Z Z' (s - x0)||_inf`` and must exceed ``pivot``.

    ``cand_ids``: candidate db row ids (ordered). Returns
    (picked_ids, Y, k, Z)."""
    n = x0.shape[0]
    Y = np.zeros((n, n)) if Y is None else Y.copy()
    Z = householder_complement(Y, k)
    avail = list(cand_ids)
    shifted = {i: seeds[i] - x0 for i in avail}
    picked = []
    while avail and len(picked) < n_pick and k < n:
        first = len(picked) == 0
        if first:
            scores = [np.max(np.abs(shifted[i])) for i in avail]
        else:
            Zv = Z[:, k:]
            scores = [np.max(np.abs(Zv @ (Zv.T @ shifted[i])))
                      for i in avail]
        bi = int(np.argmax(scores))
        if not first and not (scores[bi] > pivot):
            break
        i = avail.pop(bi)
        Y[:, k] = shifted[i]
        k += 1
        Z = householder_complement(Y, k)
        picked.append(i)
    return picked, Y, k, Z


def improving_directions(Z: np.ndarray, k: int) -> list:
    """Reversed valid complement columns (``RbfModel.jl:231-237``)."""
    n = Z.shape[0]
    return [Z[:, n - 1 - i].copy() for i in range(n - k)]


# =============================================================== RBF fit/eval
def rbf_phi(kernel, r2, param):
    if kernel == "cubic":
        kk = float(param)
        sign = (-1.0) ** math.ceil(kk / 2.0)
        return sign * r2 ** (kk / 2.0)
    if kernel == "gaussian":
        return np.exp(-(param ** 2) * r2)
    if kernel == "multiquadric":
        return -np.sqrt(1.0 + param ** 2 * r2)
    if kernel == "inv_multiquadric":
        return 1.0 / np.sqrt(1.0 + param ** 2 * r2)
    if kernel == "thin_plate_spline":
        kk = int(param)
        safe = np.where(r2 > 0, r2, 1.0)
        return np.where(r2 > 0,
                        0.5 * ((-1.0) ** (kk + 1)) * r2 ** kk * np.log(safe),
                        0.0)
    raise ValueError(kernel)


def rbf_dphi_dr2(kernel, r2, param):
    """d phi / d r2 (exact derivative of the forms above)."""
    if kernel == "cubic":
        kk = float(param)
        sign = (-1.0) ** math.ceil(kk / 2.0)
        return sign * (kk / 2.0) * r2 ** (kk / 2.0 - 1.0) if kk != 2.0 else \
            sign * np.ones_like(r2)
    if kernel == "gaussian":
        return -(param ** 2) * np.exp(-(param ** 2) * r2)
    if kernel == "multiquadric":
        return -(param ** 2) / (2.0 * np.sqrt(1.0 + param ** 2 * r2))
    if kernel == "inv_multiquadric":
        return -(param ** 2) / 2.0 * (1.0 + param ** 2 * r2) ** -1.5
    if kernel == "thin_plate_spline":
        kk = int(param)
        safe = np.where(r2 > 0, r2, 1.0)
        val = 0.5 * ((-1.0) ** (kk + 1)) * (
            kk * safe ** (kk - 1) * np.log(safe) + safe ** (kk - 1))
        return np.where(r2 > 0, val, 0.0)
    raise ValueError(kernel)


RBF_DEFAULT_PARAM = {"cubic": 3.0, "gaussian": 1.0, "multiquadric": 1.0,
                     "inv_multiquadric": 1.0, "thin_plate_spline": 2.0}


@dataclasses.dataclass
class RbfFitO:
    sites: np.ndarray   # (N, n)
    w: np.ndarray       # (N, m)
    lam: np.ndarray     # (pd, m)
    kernel: str
    param: float
    poly_deg: int

    def eval(self, x):
        d = self.sites - x[None, :]
        r2 = np.sum(d * d, axis=-1)
        out = rbf_phi(self.kernel, r2, self.param) @ self.w
        if self.poly_deg == 0:
            out = out + self.lam[0]
        elif self.poly_deg == 1:
            out = out + self.lam[0] + x @ self.lam[1:]
        return out

    def jac(self, x):
        d = x[None, :] - self.sites            # (N, n)
        r2 = np.sum(d * d, axis=-1)
        dphi = rbf_dphi_dr2(self.kernel, r2, self.param)  # (N,)
        # d/dx phi(||x-s||^2) = 2 dphi * (x - s)
        J = (2.0 * dphi[:, None] * d).T @ self.w            # (n, m)
        J = J.T                                             # (m, n)
        if self.poly_deg == 1:
            J = J + self.lam[1:].T
        return J


def rbf_fit(sites, values, kernel, param, poly_deg):
    """Plain KKT interpolation solve (no masking, no centering/scaling —
    the straightforward formulation the reference's external fit package
    implements)."""
    N, n = sites.shape
    m = values.shape[1]
    d = sites[:, None, :] - sites[None, :, :]
    Phi = rbf_phi(kernel, np.sum(d * d, axis=-1), param)
    pd = 0 if poly_deg < 0 else (1 if poly_deg == 0 else n + 1)
    if pd:
        Pi = np.ones((N, pd))
        if poly_deg == 1:
            Pi[:, 1:] = sites
        K = np.block([[Phi, Pi], [Pi.T, np.zeros((pd, pd))]])
        rhs = np.concatenate([values, np.zeros((pd, m))])
    else:
        K, rhs = Phi, values
    sol = np.linalg.solve(K, rhs)
    return RbfFitO(sites=sites.copy(), w=sol[:N], lam=sol[N:],
                   kernel=kernel, param=param, poly_deg=pd and poly_deg)


# ================================================================= Taylor fd
def build_stencil(n, degree, stamp="cfd1"):
    """Flat FD stencil (``TaylorModel.jl`` via RecursiveFiniteDifferences
    first-order stamps; Hessian = FD-of-FD tensor product)."""
    grids = {"cfd1": (np.array([-1, 0, 1]), np.array([-0.5, 0.0, 0.5])),
             "ffd1": (np.array([0, 1]), np.array([-1.0, 1.0])),
             "bfd1": (np.array([0, -1]), np.array([1.0, -1.0]))}
    grid, coef = grids[stamp]
    offsets = {}

    def site_id(off):
        key = tuple(off)
        if key not in offsets:
            offsets[key] = len(offsets)
        return offsets[key]

    site_id((0,) * n)
    G_entries = []
    for i in range(n):
        for a, ca in zip(grid, coef):
            if ca == 0.0:
                continue
            off = [0] * n
            off[i] = int(a)
            G_entries.append((i, site_id(tuple(off)), ca))
    H_entries = []
    if degree >= 2:
        import itertools
        for i in range(n):
            for j in range(n):
                for (a, ca), (b, cb) in itertools.product(
                        zip(grid, coef), repeat=2):
                    c = ca * cb
                    if c == 0.0:
                        continue
                    off = [0] * n
                    off[i] += int(a)
                    off[j] += int(b)
                    H_entries.append((i, j, site_id(tuple(off)), c))
    S = len(offsets)
    O = np.zeros((S, n))
    for key, s in offsets.items():
        O[s] = key
    G = np.zeros((n, S))
    for i, s, c in G_entries:
        G[i, s] += c
    H = np.zeros((n, n, S)) if degree >= 2 else None
    for i, j, s, c in (H_entries or []):
        H[i, j, s] += c
    return O, G, H


# ================================================================== database
class DBO:
    """Append-only per-group database of (scaled site, values)."""

    def __init__(self):
        self.X = []
        self.Y = []
        self.evaluated = []

    @property
    def count(self):
        return len(self.X)

    def add(self, x, y=None):
        self.X.append(np.array(x, float))
        self.Y.append(None if y is None else np.array(y, float))
        self.evaluated.append(y is not None)
        return self.count - 1

    def eval_missing(self, F_scaled):
        n_new = 0
        for i in range(self.count):
            if not self.evaluated[i]:
                self.Y[i] = np.asarray(F_scaled(self.X[i]), float)
                self.evaluated[i] = True
                n_new += 1
        return n_new


# ==================================================================== groups
@dataclasses.dataclass
class GroupSpec:
    """One surrogate group.

    ``role``: 'obj' | 'nl_ineq' | 'nl_eq'. ``F``/``J`` act on UNSCALED
    sites. ``kind``: 'exact' | 'rbf' | 'taylor'. RBF params mirror
    ``RbfConfig`` (round 4 off: ``max_model_points = n + 1``); Taylor
    params mirror ``TaylorConfig(mode='fd')``."""

    role: str
    m: int
    F: object
    J: object = None
    kind: str = "exact"
    kernel: str = "multiquadric"
    shape_param: float = None
    poly_deg: int = 1
    theta_e1: float = 2.0
    theta_e2: float = 2.0
    theta_pivot: float = 0.25
    taylor_degree: int = 2
    fd_stamp: str = "cfd1"
    fd_h: float = 0.001
    # lagrange params (``LagrangeConfig`` mirror)
    lag_degree: int = 2
    lag_theta_enlarge: float = 2.0
    lambda_poise: float = 1.5
    ascent_restarts: int = 8
    ascent_iters: int = 40
    # composite outers (``CompositeVecFun``, ``VecFun.jl:13-98``): tuple of
    # (outer, douter_dx, douter_dg, m_out) — the group's F is then an INNER
    # function (db stores inner values of width ``m``) and its role-vector
    # contribution is the concatenated outer outputs
    # phi(x_unscaled, inner_vals)
    outers: tuple = ()

    @property
    def role_m(self):
        """Width this group contributes to its role vector."""
        return sum(o[3] for o in self.outers) if self.outers else self.m


class GroupState:
    def __init__(self, spec: GroupSpec, n, lb_s, ub_s, scale, offset,
                 delta_max):
        self.spec = spec
        self.n = n
        self.lb_s, self.ub_s = lb_s, ub_s
        self.scale, self.offset = scale, offset
        self.delta_max = delta_max
        self.db = DBO()
        self.n_evals = 0
        # model state
        self.idx = []              # training db rows (rbf)
        self.dirs = []             # improving directions (rbf)
        self.fully_linear = spec.kind in ("exact", "taylor")
        self.fit = None            # RbfFitO
        self.t_x0 = None           # taylor expansion point
        self.t_fx0 = None
        self.t_g = None
        self.t_H = None
        self.t_site_idx = []
        if spec.kind == "taylor":
            self.O, self.G, self.Hc = build_stencil(
                n, spec.taylor_degree, spec.fd_stamp)
        if spec.kind == "lagrange":
            self.E = lag_exponents(n, spec.lag_degree)
            self.p = self.E.shape[0]
            self.grid = halton(min(50 * n, 512), n)
            self.zero_tol = float(min(np.finfo(np.float64).eps * 100,
                                      np.finfo(np.float16).eps * 10))
            self.lag_B = np.eye(self.p)
            self.lag_coef = None
            self.lag_lb = np.zeros(n)
            self.lag_ub = np.ones(n)

    # ---- true function in scaled coordinates
    def F_scaled(self, xs):
        return np.asarray(self.spec.F((xs - self.offset) / self.scale), float)

    def evaluate_true(self, xs):
        """+1 eval, insert evaluated row (``evaluate_at_unscaled_site`` +
        ``put_eval_result_into_db!``)."""
        vals = self.F_scaled(xs)
        idx = self.db.add(xs, vals)
        self.n_evals += 1
        return vals, idx

    def ensure_evaluated(self, xs):
        for i in range(self.db.count):
            if self.db.evaluated[i] and np.array_equal(self.db.X[i], xs):
                return self.db.Y[i], i
        return self.evaluate_true(xs)

    # ---- model evaluation / jacobian (scaled space)
    def model_eval(self, xs):
        k = self.spec.kind
        if k == "exact":
            return self.F_scaled(xs)
        if k == "rbf":
            return self.fit.eval(xs)
        if k == "lagrange":
            u = (xs - self.lag_lb) / (self.lag_ub - self.lag_lb)
            return self.lag_coef.T @ lag_phi(self.E, u)
        h = xs - self.t_x0
        out = self.t_fx0 + self.t_g @ h
        if self.spec.taylor_degree >= 2:
            out = out + 0.5 * np.einsum("i,mij,j->m", h, self.t_H, h)
        return out

    def model_jac(self, xs):
        k = self.spec.kind
        if k == "exact":
            J = np.asarray(self.spec.J((xs - self.offset) / self.scale),
                           float)
            return J / self.scale[None, :]
        if k == "rbf":
            return self.fit.jac(xs)
        if k == "lagrange":
            w = self.lag_ub - self.lag_lb
            u = (xs - self.lag_lb) / w
            # d/dx coef' phi(u) = coef' dphi(u) diag(1/w)
            return (self.lag_coef.T @ lag_dphi(self.E, u)) / w[None, :]
        if self.spec.taylor_degree >= 2:
            h = xs - self.t_x0
            return self.t_g + 0.5 * np.einsum(
                "mij,j->mi", self.t_H + np.swapaxes(self.t_H, 1, 2), h)
        return self.t_g

    # ---- phase 1: prepare (``prepare_update_model``)
    def prepare(self, xs, x_index, delta, efl, max_evals_budget):
        sp = self.spec
        if sp.kind == "exact":
            return
        if sp.kind == "taylor":
            moved = self.t_x0 is None or not np.array_equal(xs, self.t_x0)
            if moved:
                sites = xs[None, :] + sp.fd_h * self.O
                sites = np.clip(sites, self.lb_s[None, :], self.ub_s[None, :])
                idx = [x_index]
                for i in range(1, sites.shape[0]):
                    idx.append(self.db.add(sites[i]))
                self.t_site_idx = idx
            return
        if sp.kind == "lagrange":
            self._lag_prepare(xs, x_index, delta)
            return
        # ---- RBF rounds 1-3 (round 4 off)
        n = self.n
        delta_1 = sp.theta_e1 * delta
        lb1 = np.maximum(self.lb_s, xs - delta_1)
        ub1 = np.minimum(self.ub_s, xs + delta_1)
        piv1 = sp.theta_pivot * delta_1
        delta_2 = sp.theta_e2 * self.delta_max
        num_unevaluated = sum(not e for e in self.db.evaluated)
        max_new = max_evals_budget - 1 - self.n_evals - num_unevaluated

        def in_box(x, lo, hi):
            return bool(np.all((x >= lo) & (x <= hi)))

        cand1 = [i for i in range(self.db.count)
                 if i != x_index and in_box(self.db.X[i], lb1, ub1)]
        r1, Y, kk, Z = affinely_independent(
            xs, self.db.X, cand1, piv1, n)
        dirs = improving_directions(Z, kk)
        n_missing1 = n - len(r1)

        r2 = []
        skip2 = True
        if not efl:
            skip2 = (n_missing1 == 0) or (
                sp.theta_e1 == sp.theta_e2
                and np.isclose(delta, self.delta_max))
            if not skip2:
                lb2 = np.maximum(self.lb_s, xs - delta_2)
                ub2 = np.minimum(self.ub_s, xs + delta_2)
                cand2 = [i for i in range(self.db.count)
                         if i != x_index and i not in cand1
                         and in_box(self.db.X[i], lb2, ub2)]
                r2, _, _, _ = affinely_independent(
                    xs, self.db.X, cand2, piv1, n_missing1, Y=Y, k=kk)
        n_missing2 = n_missing1 - len(r2)

        def round3(dirs_, n_missing_, allow_fail):
            """(``_rbf_round3``) sample along directions; returns
            (sites, ok_flags, covers) or None on pivot-fail when a fully
            linear model is required (triggering the coordinate rebuild)."""
            n_new = max(0, min(n_missing_, max_new))
            sites, oks = [], []
            for i in range(n_new):
                d = dirs_[i]
                ln = _intersect_absmax(xs, d, lb1, ub1)
                off = ln * d
                ok = np.max(np.abs(off)) > piv1
                if not ok and not allow_fail:
                    return None
                sites.append(xs + off)
                oks.append(ok)
            covers = n_new >= n_missing_
            return sites, oks, covers, n_new

        rebuild = False
        res3 = (([], [], n_missing2 <= 0, 0) if n_missing2 <= 0 else
                round3(dirs, n_missing2, allow_fail=not efl))
        if res3 is None:
            # coordinate-axis rebuild (``:633-637``): dismiss rounds 1-2
            rebuild = True
            r1, r2 = [], []
            dirs = [np.eye(n)[:, i].copy() for i in range(n)]
            res3 = round3(dirs, n, allow_fail=True)
        sites3, ok3, covers3, n_new = res3
        round3_ran = rebuild or (n_missing2 > 0)
        r3 = [self.db.add(s) for s in sites3]
        fl3 = covers3 and all(ok3)
        if round3_ran:
            fully_linear = fl3 and (len(r2) == 0)
        else:
            fully_linear = skip2

        self.idx = [x_index] + r1 + r2 + r3
        # remaining improving directions in consumption order
        # (``improving_directions[n_new+1:end]``, ``RbfModel.jl:305``)
        self.dirs = dirs[n_new:]
        self.fully_linear = bool(fully_linear)

    def _lag_prepare(self, xs, x_index, delta):
        """Poised-set construction: Conn et al. Algorithm 6.2 + 6.3
        (``get_poised_set`` / ``make_set_lambda_poised``,
        ``LagrangeModel.jl:217-382``) with the Halton+PGA NLopt
        replacement."""
        sp = self.spec
        p, n = self.p, self.n
        lb = np.maximum(self.lb_s, xs - delta * sp.lag_theta_enlarge)
        ub = np.minimum(self.ub_s, xs + delta * sp.lag_theta_enlarge)
        w = ub - lb

        # candidates: [x; db rows in box (excluding x_index)], unit coords
        cand_ids = [None]  # slot 0 = x itself (db row x_index)
        cand_pts = [xs]
        avail = [True]
        for i in range(self.db.count):
            cand_ids.append(i)
            cand_pts.append(self.db.X[i])
            avail.append(i != x_index and bool(
                np.all((self.db.X[i] >= lb) & (self.db.X[i] <= ub))))
        cand_unit = [(c - lb) / w for c in cand_pts]
        phis = lag_phi_batch(self.E, np.stack(cand_unit))

        # ---- Algorithm 6.2
        B = np.eye(p)
        points = np.zeros((p, n))
        src = -np.ones(p, dtype=int)
        for i in range(p):
            vals = np.abs(phis @ B[i])
            vals = np.where(avail, vals, -np.inf)
            j = int(np.argmax(vals))
            if vals[j] > self.zero_tol:
                u_new = cand_unit[j]
                src[i] = x_index if cand_ids[j] is None else cand_ids[j]
                avail[j] = False
            else:
                u_new, _ = lag_maximize_abs(B[i], self.E, self.grid,
                                            sp.ascent_iters,
                                            sp.ascent_restarts)
                src[i] = -1
            points[i] = u_new
            B = lag_orthogonalize(self.E, B, u_new, i)

        # ---- Algorithm 6.3 (one swap per pass, <= 2p passes)
        for _ in range(2 * p):
            xs_all, vs_all = [], []
            for i in range(p):
                x_i, v_i = lag_maximize_abs(
                    B[i], self.E, self.grid, sp.ascent_iters,
                    sp.ascent_restarts, extra=points[i][None, :])
                xs_all.append(x_i)
                vs_all.append(v_i)
            exceeds = np.asarray(vs_all) > sp.lambda_poise
            if not np.any(exceeds):
                break
            is_center = src == x_index
            center_slot = int(np.argmax(is_center))  # first, or 0 if none
            pri = exceeds & (np.arange(p) != center_slot)
            i_k = int(np.argmax(pri)) if np.any(pri) else int(
                np.argmax(exceeds))
            u_new = xs_all[i_k]
            B = lag_orthogonalize(self.E, B, u_new, i_k)
            points[i_k] = u_new
            src[i_k] = -1

        # ---- consume points (``_consume_points``)
        idx = []
        for i in range(p):
            if src[i] < 0:
                idx.append(self.db.add(lb + w * points[i]))
            else:
                idx.append(int(src[i]))
        self.idx = idx
        self.lag_B = B
        self.lag_lb, self.lag_ub = lb, ub
        self.fully_linear = True

    def prepare_improve(self, xs, x_index, delta):
        """One site along the next improving direction
        (``prepare_improve_model``): the direction is consumed before the
        pivot test. Lagrange improve = re-prepare with fully-linear
        enforcement (``LagrangeOps.prepare_improve``)."""
        sp = self.spec
        if sp.kind == "lagrange":
            self._lag_prepare(xs, x_index, delta)
            return
        if sp.kind != "rbf" or self.fully_linear or not self.dirs:
            return
        delta_1 = sp.theta_e1 * delta
        lb1 = np.maximum(self.lb_s, xs - delta_1)
        ub1 = np.minimum(self.ub_s, xs + delta_1)
        piv1 = sp.theta_pivot * delta_1
        d = self.dirs.pop(0)
        ln = _intersect_absmax(xs, d, lb1, ub1)
        off = ln * d
        success = np.max(np.abs(off)) > piv1
        if success:
            self.idx.append(self.db.add(xs + off))
            if not self.dirs:
                self.fully_linear = True

    # ---- eval_missing + phase 2
    def finish(self, xs, x_index, delta):
        self.n_evals += self.db.eval_missing(self.F_scaled)
        sp = self.spec
        if sp.kind == "rbf":
            sites = np.stack([self.db.X[i] for i in self.idx])
            values = np.stack([self.db.Y[i] for i in self.idx])
            param = (sp.shape_param if sp.shape_param is not None
                     else RBF_DEFAULT_PARAM[sp.kernel])
            self.fit = rbf_fit(sites, values, sp.kernel, param, sp.poly_deg)
        elif sp.kind == "lagrange":
            Y = np.stack([self.db.Y[i] for i in self.idx])
            self.lag_coef = self.lag_B.T @ Y
        elif sp.kind == "taylor":
            moved = self.t_x0 is None or not np.array_equal(xs, self.t_x0)
            if moved:
                Y = np.stack([self.db.Y[i] for i in self.t_site_idx])
                self.t_g = (self.G @ Y / sp.fd_h).T
                if sp.taylor_degree >= 2:
                    self.t_H = np.einsum("ijs,sm->mij", self.Hc,
                                         Y) / sp.fd_h ** 2
                else:
                    self.t_H = np.zeros((sp.m, self.n, self.n))
                self.t_x0 = xs.copy()
                self.t_fx0 = self.db.Y[x_index].copy()


def _intersect_absmax(x, d, lb, ub):
    """``intersect_box(...; return_vals=:absmax)`` — the larger-magnitude of
    the positive/negative box exit along d (``utilities.jl:156-287``)."""
    sig_pos, sig_neg = [], []
    for bound, sense_lb in ((lb, True), (ub, False)):
        tmp = bound - x
        for i in range(x.shape[0]):
            if tmp[i] == 0:
                out = d[i] > 0 if sense_lb else d[i] < 0
                s = 0.0 if out else np.inf
            elif d[i] != 0:
                s = tmp[i] / d[i]
            else:
                s = np.inf
            (sig_pos if s >= 0 else sig_neg).append(s)
    if np.all(d == 0):
        return np.inf
    pos = min(sig_pos) if sig_pos else 0.0
    neg = max(sig_neg) if sig_neg else 0.0
    return pos if abs(pos) >= abs(neg) else neg


def _intersect_pos(x, d, lb, ub):
    sigmas = []
    for bound, sense_lb in ((lb, True), (ub, False)):
        tmp = bound - x
        for i in range(x.shape[0]):
            if tmp[i] == 0:
                out = d[i] > 0 if sense_lb else d[i] < 0
                sigmas.append(np.inf if out else 0.0)
            elif d[i] != 0:
                sigmas.append(tmp[i] / d[i])
            else:
                sigmas.append(np.inf)
    s = np.asarray(sigmas)
    nonneg = s >= 0
    return float(np.min(s[nonneg])) if np.any(nonneg) else 0.0


# ==================================================================== filter
class FilterO:
    """Unbounded MaxFilter with envelope-shifted inserts
    (``AbstractFilterInterface.jl:32-71``)."""

    def __init__(self, shift):
        self.entries = []
        self.shift = shift

    def add(self, theta, f):
        self.entries.append((theta - self.shift * theta,
                             f - self.shift * theta))

    def acceptable(self, theta, f):
        return not any(theta > tj and f > fj for tj, fj in self.entries)

    def acceptable_vs(self, theta, f, theta_k, f_k):
        ok_k = (theta <= (1.0 - self.shift) * theta_k) or (
            f <= f_k - self.shift * theta_k)
        return ok_k and self.acceptable(theta, f)


# ================================================================ LP helpers
def descent_lp(x_s, Dm, lb_s, ub_s, A_con=None, b_con=None):
    m, n = Dm.shape
    c_norm = np.linalg.norm(Dm, axis=1)
    c_norm = np.where(c_norm > 0, c_norm, 1.0)
    A_ub = np.concatenate([Dm, -c_norm[:, None]], axis=1)
    b_ub = np.zeros(m)
    if A_con is not None and A_con.shape[0]:
        A_ub = np.concatenate(
            [A_ub, np.concatenate([A_con, np.zeros((A_con.shape[0], 1))],
                                  axis=1)], axis=0)
        b_ub = np.concatenate([b_ub, b_con])
    bounds = [(max(-1.0, lb_s[i] - x_s[i]), min(1.0, ub_s[i] - x_s[i]))
              for i in range(n)] + [(None, None)]
    res = linprog(np.concatenate([np.zeros(n), [1.0]]), A_ub=A_ub, b_ub=b_ub,
                  bounds=bounds, method="highs")
    if not res.success or not np.all(np.isfinite(res.x[:n])):
        return np.zeros(n), -np.inf
    return res.x[:n], -res.x[n]


def normal_step_lp(x_s, lb_s, ub_s, A_s, rhs, kappa_delta, delta_max,
                   variable_radius):
    n = x_s.shape[0]
    q = A_s.shape[0]
    nv = n + 1 + (1 if variable_radius else 0)
    rows = [np.concatenate([np.eye(n), -np.ones((n, 1))], axis=1),
            np.concatenate([-np.eye(n), -np.ones((n, 1))], axis=1),
            np.concatenate([A_s, np.zeros((q, 1))], axis=1)]
    b_ub = np.concatenate([np.zeros(2 * n), rhs])
    c = np.zeros(nv)
    if variable_radius:
        rows = [np.concatenate([r, np.zeros((r.shape[0], 1))], axis=1)
                for r in rows]
        rows.append(np.concatenate(
            [np.zeros((1, n)), np.ones((1, 1)),
             np.full((1, 1), -kappa_delta)], axis=1))
        b_ub = np.concatenate([b_ub, np.zeros(1)])
        c[n + 1] = 1.0
    else:
        c[n] = 1.0
    A_ub = np.concatenate(rows, axis=0)
    bounds = ([(lb_s[i] - x_s[i], ub_s[i] - x_s[i]) for i in range(n)]
              + [(0.0, None)]
              + ([(0.0, delta_max)] if variable_radius else []))
    res = linprog(c, A_ub=A_ub, b_ub=b_ub, bounds=bounds, method="highs")
    if not res.success:
        return np.full(n, np.nan), None, False
    n_step = np.clip(x_s + res.x[:n], lb_s, ub_s) - x_s
    return n_step, (res.x[n + 1] if variable_radius else None), True


# ==================================================================== result
@dataclasses.dataclass
class OracleResult:
    x: np.ndarray
    fx: np.ndarray
    stop_code: int
    n_iterations: int
    group_evals: list
    traj_x: list
    traj_fx: list
    traj_delta: list
    traj_rho: list
    traj_omega: list
    traj_steplength: list
    traj_it_stat: list
    traj_x_index: list
    # per-group [(scaled_site, values), ...] snapshots for ``populated_db``
    # recycling into a follow-up solve (``algorithm.jl:286-297``)
    dbs: list = dataclasses.field(default_factory=list)


# ==================================================================== solver
def solve_oracle_full(
        lb, ub, groups, x0, *,
        A_ineq=None, b_ineq=None,
        descent="steepest", ps_reference_direction=None,
        max_iter=50, max_evals=None,
        delta_0=0.1, delta_max=0.5, eps_crit=1e-3, gamma_crit=0.51,
        max_critical_loops=5, mu=2e3, beta=1e3,
        nu_success=0.2, nu_accept=0.0,
        gamma_grow=2.0, gamma_shrink=0.75, gamma_shrink_much=0.51,
        strict_acceptance_test=True,
        filter_shift=1e-4,
        filter_kappa_delta=0.7, filter_kappa_mu=100.0,
        filter_mu=0.01, filter_kappa_psi=1e-4, filter_psi=1.0,
        max_restoration_evals=-1,
        f_tol_rel=SQRT_EPS_F32, x_tol_rel=SQRT_EPS_F32,
        f_tol_abs=-1.0, x_tol_abs=-1.0,
        omega_tol_rel=10 * SQRT_EPS_F32, delta_tol_rel=SQRT_EPS_F32,
        omega_tol_abs=-np.inf, delta_tol_abs=SQRT_EPS_F32,
        stepnorm_tol_abs=0.0,
        radius_update_method="standard",
        var_scaler_update="none",
        populated_db=None,
        ps_n_samples=None) -> OracleResult:
    """Sequential full-scope reference solve. ``groups`` is a list of
    :class:`GroupSpec` (objective groups first, in registration order —
    matching ``compile_mop`` group order).

    ``radius_update_method``: 'standard' | 'steplength'
    (``do_radius_update``, ``algorithm.jl:140-196``).
    ``var_scaler_update``: 'none' | 'model' — per-iteration Jacobian-based
    rescaling + database retransform (``new_var_scaler``,
    ``VarScaler.jl:240-260``; ``algorithm.jl:661-679``).
    ``populated_db``: per-group list of (scaled_site, values) rows recycled
    from a previous run on the same problem/scaler (``algorithm.jl:286-297``;
    eval counters start at zero, ``reset_evals!``)."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    n = lb.shape[0]
    all_finite = bool(np.all(np.isfinite(lb)) and np.all(np.isfinite(ub)))
    if all_finite:  # unit-cube scaling (``VarScaler.jl:205-213``)
        scale = 1.0 / (ub - lb)
        offset = -lb * scale
        lb_s, ub_s = np.zeros(n), np.ones(n)
    else:  # NoVarScaling (``VarScaler.jl:62-89``)
        scale = np.ones(n)
        offset = np.zeros(n)
        lb_s, ub_s = lb.copy(), ub.copy()
    to_s = lambda x: scale * x + offset
    from_s = lambda xs: (xs - offset) / scale

    def lin_rows_scaled():
        """``transformed_linear_constraints`` under the CURRENT scaler."""
        if A_ineq is None:
            return np.zeros((0, n)), np.zeros(0)
        A = np.asarray(A_ineq, float) / scale[None, :]
        return A, np.asarray(b_ineq, float) + A @ offset

    A_s, b_s = lin_rows_scaled()
    q_lin = A_s.shape[0]
    l_i_at = lambda xs: A_s @ xs - b_s

    G = [GroupState(sp, n, lb_s, ub_s, scale, offset, delta_max)
         for sp in groups]
    if populated_db is not None:
        for g, rows in zip(G, populated_db):
            for xr, yr in rows:
                g.db.add(np.asarray(xr, float),
                         None if yr is None else np.asarray(yr, float))
    obj_groups = [g for g in G if g.spec.role == "obj"]
    ci_groups = [g for g in G if g.spec.role == "nl_ineq"]
    ce_groups = [g for g in G if g.spec.role == "nl_eq"]
    m_obj = sum(g.spec.role_m for g in obj_groups)
    m_ci = sum(g.spec.m for g in ci_groups)
    m_ce = sum(g.spec.m for g in ce_groups)
    has_nl = m_ci + m_ce > 0
    has_constraints = has_nl or q_lin > 0
    eval_cap = max_evals if max_evals is not None else 2 ** 31 - 1

    def budget_exhausted():
        if eval_cap >= 2 ** 31 - 1:
            return False
        return any(g.n_evals >= eval_cap for g in obj_groups)

    def cat(parts, width):
        return (np.concatenate(parts) if parts else np.zeros(width))

    def apply_outers(g, vals, xu):
        """Composite role-vector entries: phi(x_unscaled, inner_vals)
        (``scatter_role_vectors`` + ``CompositeSurrogate``)."""
        if not g.spec.outers:
            return vals
        return np.concatenate(
            [np.atleast_1d(np.asarray(out(xu, vals), float))
             for out, _, _, _ in g.spec.outers])

    def evaluate_true_all(xs):
        """One counted true evaluation + db insert per group."""
        fx, ce, ci, idx = [], [], [], []
        xu = from_s(xs)
        for g in G:
            vals, i = g.evaluate_true(xs)
            idx.append(i)
            (fx if g.spec.role == "obj" else
             ce if g.spec.role == "nl_eq" else ci).append(
                 apply_outers(g, vals, xu) if g.spec.role == "obj" else vals)
        return (cat(fx, m_obj), cat(ce, m_ce), cat(ci, m_ci), idx)

    # ---- model-space role vectors
    def model_obj(xs, counted=True):
        out = []
        for g in obj_groups:
            if counted and g.spec.kind == "exact":
                g.n_evals += 1
            out.append(apply_outers(g, g.model_eval(xs), from_s(xs)))
        return cat(out, m_obj)

    def model_obj_jac(xs):
        parts = []
        for g in obj_groups:
            Jm = g.model_jac(xs)
            if not g.spec.outers:
                parts.append(Jm)
                continue
            # chain rule of ``CompositeSurrogate``
            # (``AbstractSurrogateInterface.jl:193-229``):
            # d/dxs phi(untransform(xs), m(xs))
            #   = dphi/dx * diag(1/scale) + dphi/dg @ Jm
            xu = from_s(xs)
            mv = g.model_eval(xs)
            for _, dphi_dx, dphi_dg, _ in g.spec.outers:
                parts.append(
                    np.atleast_2d(np.asarray(dphi_dx(xu, mv), float))
                    / scale[None, :]
                    + np.atleast_2d(np.asarray(dphi_dg(xu, mv), float)) @ Jm)
        return np.concatenate(parts) if parts else np.zeros((0, n))

    def model_nl(xs, role_groups, width):
        return cat([g.model_eval(xs) for g in role_groups], width)

    def model_nl_jac(xs, role_groups, width):
        return (np.concatenate([g.model_jac(xs) for g in role_groups])
                if role_groups else np.zeros((0, n)))

    def theta_of(l_i, c_e, c_i):
        parts = [0.0]
        if l_i.size:
            parts.append(float(np.max(l_i)))
        if c_e.size:
            parts.append(float(np.max(np.abs(c_e))))
        if c_i.size:
            parts.append(float(np.max(c_i)))
        return max(parts)

    viol_zero = lambda th: abs(th) <= 10 * EPS64

    def update_models(xs, x_idx, delta, efl=False, improve=False):
        """``update_or_improve`` two-phase (prepare -> eval_missing -> fit)."""
        for g, xi in zip(G, x_idx):
            if improve:
                g.prepare_improve(xs, xi, delta)
            else:
                g.prepare(xs, xi, delta, efl, eval_cap)
        for g, xi in zip(G, x_idx):
            g.finish(xs, xi, delta)

    def linearized_rows(xs, x_n_s, l_i_n):
        """Descent-LP inequality rows at x+n (``descent.jl:199-236``):
        linear rows with rhs -l_i(x_n); NL surrogate rows with jac at x,
        value at x_n (shifted)."""
        n_step = x_n_s - xs
        parts_A, parts_b = [A_s], [-l_i_n]
        if m_ci:
            Dm = model_nl_jac(xs, ci_groups, m_ci)
            mi = model_nl(x_n_s, ci_groups, m_ci)
            parts_A.append(Dm)
            parts_b.append(-mi - Dm @ n_step)
        if m_ce:
            Dm = model_nl_jac(xs, ce_groups, m_ce)
            me = model_nl(x_n_s, ce_groups, m_ce)
            parts_A += [Dm, -Dm]
            parts_b += [-me - Dm @ n_step, me + Dm @ n_step]
        A = np.concatenate(parts_A) if parts_A else np.zeros((0, n))
        b = np.concatenate(parts_b) if parts_b else np.zeros(0)
        return A, b

    def fully_linear_all():
        return all(g.fully_linear for g in G)

    def omega_tests(omega, dlt):
        return ((omega <= omega_tol_rel) and (dlt <= delta_tol_rel)) or (
            omega <= omega_tol_abs)

    def tol_tests(x_old, x_new, fx_old, fx_new):
        inf = lambda v: float(np.max(np.abs(v))) if v.size else 0.0
        fr = inf(fx_old - fx_new) <= f_tol_rel * inf(fx_old)
        xr = inf(x_old - x_new) <= x_tol_rel * inf(x_old)
        fa = inf(fx_old - fx_new) <= f_tol_abs
        xa = inf(x_old - x_new) <= x_tol_abs
        return fr or xr or fa or xa

    filt = FilterO(filter_shift) if has_nl else None

    # ---------------------------------------------------------- initialize
    x = np.clip(np.asarray(x0, float), lb, ub)
    x_s = to_s(x)
    fx, c_e, c_i, x_idx = [], [], [], []
    for g in G:
        vals, i = g.ensure_evaluated(x_s)
        x_idx.append(i)
        (fx if g.spec.role == "obj" else
         c_e if g.spec.role == "nl_eq" else c_i).append(
             apply_outers(g, vals, from_s(x_s))
             if g.spec.role == "obj" else vals)
    fx = cat(fx, m_obj)
    c_e = cat(c_e, m_ce)
    c_i = cat(c_i, m_ci)
    l_i = l_i_at(x_s)
    delta = float(delta_0)

    R = OracleResult(x=x, fx=fx, stop_code=CONTINUE, n_iterations=0,
                     group_evals=[], traj_x=[], traj_fx=[], traj_delta=[],
                     traj_rho=[], traj_omega=[], traj_steplength=[],
                     traj_it_stat=[], traj_x_index=[])

    def stamp(x_u, fxv, dlt, rho, omega, sl, it_stat, xi):
        R.traj_x.append(np.array(x_u))
        R.traj_fx.append(np.array(fxv))
        R.traj_delta.append(dlt)
        R.traj_rho.append(rho)
        R.traj_omega.append(omega)
        R.traj_steplength.append(sl)
        R.traj_it_stat.append(it_stat)
        R.traj_x_index.append(list(xi))

    stamp(x, fx, delta, -np.inf, -np.inf, -np.inf, INITIALIZATION, x_idx)
    update_models(x_s, x_idx, delta, efl=True)

    iter_counter = 1
    last_it_stat = ACCEPTABLE
    stop_code = CONTINUE

    # ------------------------------------------------- PS criticality mirror
    def ps_criticality(xs, x_n_s, fx_n, delta):
        """Mirror of ``Solver._ps_criticality`` with the reference default
        budgets (grid = 500*(n+1), no polish)."""
        n_grid = (ps_n_samples if ps_n_samples is not None
                  else 500 * (n + 1))
        grid_unit = halton(n_grid, n)
        lb_eff = np.maximum(lb_s, xs - delta)
        ub_eff = np.minimum(ub_s, xs + delta)
        PEN_W = 1e5

        def penalty(chi):
            pen = 0.0
            if m_ce:
                pen += float(np.sum(model_nl(chi, ce_groups, m_ce) ** 2))
            if m_ci:
                pen += float(np.sum(
                    np.maximum(model_nl(chi, ci_groups, m_ci), 0.0) ** 2))
            if q_lin:
                pen += float(np.sum(np.maximum(A_s @ chi - b_s, 0.0) ** 2))
            return pen

        charged = n_grid  # + 0 polish
        if ps_reference_direction is not None:
            r = np.asarray(ps_reference_direction, float)
        else:
            charged += m_obj * n_grid
            pts_i = lb_eff[None, :] + (ub_eff - lb_eff)[None, :] * grid_unit
            ideals = []
            for li in range(m_obj):
                vals = [-(model_obj(p, counted=False)[li]
                          + PEN_W * penalty(p)) for p in pts_i]
                best = int(np.argmax(vals))
                ideals.append(-vals[best])
            r = fx_n - np.asarray(ideals)

        mx = model_obj(x_n_s, counted=False)

        def t_pure(chi):
            return float(np.max((model_obj(chi, counted=False) - mx) / r))

        def t_pen(chi):
            return -(t_pure(chi) + PEN_W * penalty(chi))

        pts = np.concatenate(
            [x_n_s[None, :],
             lb_eff[None, :] + (ub_eff - lb_eff)[None, :] * grid_unit])
        vals = [t_pen(p) for p in pts]
        x_best = pts[int(np.argmax(vals))]
        tau = min(max(t_pure(x_best), -1.0), 0.0)
        feasible = penalty(x_best) <= 1e-8
        critical = bool(np.any(r <= 0))
        bad = critical or (not feasible) or (
            not np.all(np.isfinite(x_best)))
        x_trial = x_n_s if bad else x_best
        omega = 0.0 if bad else abs(tau)
        for g in G:
            if g.spec.kind == "exact":
                g.n_evals += charged
        return omega, x_trial

    def get_criticality(xs, x_n_s, l_i_n, fx_n, delta):
        if descent == "ps":
            return ps_criticality(xs, x_n_s, fx_n, delta)
        Dm = model_obj_jac(x_n_s)
        A_c, b_c = linearized_rows(xs, x_n_s, l_i_n)
        return_d = descent_lp(x_n_s, Dm, lb_s, ub_s, A_c, b_c)
        return return_d[1], return_d[0]  # (omega, d)

    # ------------------------------------------------------------ restoration
    def restoration(theta_k, n_step):
        """Projected-gradient restoration mirror (``Solver._restoration``)."""
        nonlocal x, x_s, fx, c_e, c_i, l_i, x_idx, last_it_stat, iter_counter
        filt.add(theta_k, float(np.max(fx)))

        def true_constraints(xi):
            ce = cat([np.asarray(g.spec.F(xi), float) for g in ce_groups],
                     m_ce)
            ci = cat([np.asarray(g.spec.F(xi), float) for g in ci_groups],
                     m_ci)
            l_e_u = np.zeros(0)
            l_i_u = (np.asarray(A_ineq, float) @ xi - np.asarray(b_ineq, float)
                     if q_lin else np.zeros(0))
            return l_e_u, l_i_u, ce, ci

        def merit_theta(xi):
            l_e_u, l_i_u, ce, ci = true_constraints(xi)
            m = (float(np.sum(ce ** 2))
                 + float(np.sum(np.maximum(ci, 0.0) ** 2))
                 + float(np.sum(l_e_u ** 2))
                 + float(np.sum(np.maximum(l_i_u, 0.0) ** 2)))
            parts = [0.0]
            if l_i_u.size:
                parts.append(float(np.max(l_i_u)))
            if ce.size:
                parts.append(float(np.max(np.abs(ce))))
            if ci.size:
                parts.append(float(np.max(ci)))
            return m, max(parts)

        def grad(xi):
            g_out = np.zeros(n)
            if m_ce:
                J = np.concatenate([np.asarray(g.spec.J(xi), float)
                                    for g in ce_groups])
                ce = cat([np.asarray(g.spec.F(xi), float)
                          for g in ce_groups], m_ce)
                g_out += 2.0 * (J.T @ ce)
            if m_ci:
                J = np.concatenate([np.asarray(g.spec.J(xi), float)
                                    for g in ci_groups])
                ci = cat([np.asarray(g.spec.F(xi), float)
                          for g in ci_groups], m_ci)
                g_out += 2.0 * (J.T @ np.maximum(ci, 0.0))
            if q_lin:
                Au = np.asarray(A_ineq, float)
                l_i_u = Au @ xi - np.asarray(b_ineq, float)
                g_out += 2.0 * (Au.T @ np.maximum(l_i_u, 0.0))
            return g_out

        r0 = (np.zeros(n) if np.any(np.isnan(n_step))
              else np.nan_to_num(n_step) / np.maximum(scale, 1e-30))
        xi = np.clip(x + r0, lb, ub)
        if max_restoration_evals > 0:
            ev_cap = max_restoration_evals
        else:
            ev_cap = 500 * n
            for g in ce_groups + ci_groups:
                gmax = min(eval_cap, 2 ** 31 - 1)
                if gmax < 2 ** 31 - 1:
                    ev_cap = min(ev_cap, gmax - g.n_evals)
            ev_cap = max(ev_cap, 0)
        cap = max(ev_cap // 2, 1) if ev_cap >= 1 else 0
        stopval = 10 * EPS64
        width = np.where(np.isfinite(ub - lb), ub - lb, 1.0)

        m_cur, t0 = merit_theta(xi)
        x_best, t_best = xi.copy(), t0
        done = t_best <= stopval
        sc = 0.1
        i_used = 0
        while not done and i_used < cap:
            gr = grad(xi)
            gn = float(np.max(np.abs(gr)))
            step = sc * float(np.min(width)) / gn if gn > 0 else 0.0
            xi_n = np.clip(xi - step * gr, lb, ub)
            m_n, t_n = merit_theta(xi_n)
            if m_n < m_cur:
                xi, m_cur = xi_n, m_n
                sc = min(sc * 1.25, 0.5)
            else:
                sc = sc * 0.5
            if t_n < t_best:
                x_best, t_best = xi_n.copy(), t_n
            done = (t_best <= stopval) or (sc < 1e-10)
            i_used += 1
        if max_restoration_evals <= 0:
            for g in ce_groups + ci_groups:
                g.n_evals += 2 * i_used

        x_r_s = to_s(x_best)
        fx_r, c_e_r, c_i_r, idx_r = evaluate_true_all(x_r_s)
        if filt.acceptable(t_best, float(np.max(fx_r))):
            x, x_s = x_best, x_r_s
            fx, c_e, c_i = fx_r, c_e_r, c_i_r
            l_i = l_i_at(x_s)
            x_idx = idx_r
            stamp(x, fx, delta, -np.inf, -np.inf, -np.inf, RESTORATION,
                  x_idx)
            last_it_stat = RESTORATION
            iter_counter += 1
            return CONTINUE
        iter_counter += 1
        return INFEASIBLE

    # --------------------------------------------- :model scaler update
    def rescale_model():
        """Mirror of ``Solver._rescale_model``: estimate new per-coordinate
        factors from the stacked model Jacobian (objectives, nl_eq,
        nl_ineq — ``container.jac_all`` order), retransform every database
        and the iterate (``new_var_scaler``, ``VarScaler.jl:240-260``;
        ``algorithm.jl:661-679``)."""
        nonlocal scale, offset, lb_s, ub_s, A_s, b_s, x_s, l_i
        parts = [model_obj_jac(x_s)]
        if m_ce:
            parts.append(model_nl_jac(x_s, ce_groups, m_ce))
        if m_ci:
            parts.append(model_nl_jac(x_s, ci_groups, m_ci))
        # Jf ~ Jm diag(scale_old) (chain rule back to unscaled x)
        J = np.concatenate(parts) * scale[None, :]
        w = ub - lb
        bounded = np.isfinite(w)
        target = (np.mean(np.abs(J[:, bounded] / w[bounded][None, :]),
                          axis=1) if bounded.any() else None)
        factors = np.empty(n)
        for j in range(n):
            if bounded[j]:
                factors[j] = 1.0 / w[j]
                continue
            col = J[:, j]
            nz = col != 0
            nnz = int(nz.sum())
            safe = np.where(nz, np.abs(col), 1.0)
            log_t = 0.0
            if target is not None:
                safe_t = np.where(nz & (target != 0), np.abs(target), 1.0)
                log_t = float(np.sum(np.log(safe_t)))
            exp_arg = -float(np.sum(np.log(safe))) + log_t
            factors[j] = (np.exp(exp_arg / max(nnz, 1)) if nnz > 0 else 1.0)
        scale_new = np.clip(factors, 1e-8, 1e8)
        offset_new = np.zeros(n)
        lb_s_new = scale_new * lb + offset_new
        ub_s_new = scale_new * ub + offset_new
        for g in G:
            for i in range(g.db.count):
                g.db.X[i] = (((g.db.X[i] - offset) / scale) * scale_new
                             + offset_new)
            g.scale, g.offset = scale_new, offset_new
            g.lb_s, g.ub_s = lb_s_new, ub_s_new
        scale, offset = scale_new, offset_new
        lb_s, ub_s = lb_s_new, ub_s_new
        x_s = to_s(x)
        A_s, b_s = lin_rows_scaled()
        l_i = l_i_at(x_s)

    # ================================================================= loop
    while stop_code == CONTINUE:
        if iter_counter > max_iter:
            stop_code = MAX_ITER
            break
        if budget_exhausted():
            stop_code = BUDGET_EXHAUSTED
            break
        if delta <= delta_tol_abs:
            stop_code = TOLERANCE
            break

        # ---- per-iteration :model scaler update, before the surrogate
        # update and never mid-criticality (``algorithm.jl:661-679``)
        if var_scaler_update == "model" and iter_counter > 1:
            rescale_model()

        # ---- surrogate update / improve (``algorithm.jl:682-688``)
        if iter_counter > 1:
            update_models(x_s, x_idx, delta,
                          improve=(last_it_stat == MODELIMPROVING))

        theta_k = theta_of(l_i, c_e, c_i)

        # ---- normal step / restoration (``find_normal_step``)
        x_n_s, fx_n, c_e_n, c_i_n, l_i_n, idx_n = (
            x_s, fx, c_e, c_i, l_i, x_idx)
        took_normal = False
        if has_constraints and not viol_zero(theta_k):
            A_lin, b_lin = linearized_rows(x_s, x_s, l_i)
            variable_radius = last_it_stat == RESTORATION
            n_step, delta_n_lp, feasible = normal_step_lp(
                x_s, lb_s, ub_s, A_lin, b_lin, filter_kappa_delta,
                delta_max, variable_radius)
            delta_n = (delta_n_lp if variable_radius and feasible
                       else delta)
            norm_n = float(np.max(np.where(np.isnan(n_step), np.inf,
                                           np.abs(n_step))))
            compatible = feasible and norm_n <= (
                filter_kappa_delta * delta_n
                * min(1.0, filter_kappa_mu * delta_n ** filter_mu))
            if not compatible:
                if has_nl:
                    if last_it_stat == RESTORATION:
                        stop_code = INFEASIBLE
                        iter_counter += 1
                        break
                    ret = restoration(theta_k, n_step)
                    if ret != CONTINUE:
                        stop_code = ret
                        break
                    continue
                # linear-only restoration (``algorithm.jl:447-452``)
                if last_it_stat == RESTORATION or not (
                        feasible and np.all(np.isfinite(n_step))):
                    stop_code = INFEASIBLE
                    iter_counter += 1
                    break
                x_n_s = x_s + np.nan_to_num(n_step)
                fx_n, c_e_n, c_i_n, idx_n = evaluate_true_all(x_n_s)
                x, x_s = from_s(x_n_s), x_n_s
                fx, c_e, c_i = fx_n, c_e_n, c_i_n
                l_i = l_i_at(x_s)
                x_idx = idx_n
                stamp(x, fx, delta, -np.inf, -np.inf, -np.inf,
                      RESTORATION, x_idx)
                last_it_stat = RESTORATION
                iter_counter += 1
                continue
            if variable_radius and not np.isclose(delta_n, delta):
                delta = delta_n
                for g in G:
                    if g.spec.kind == "rbf":
                        g.fully_linear = False
            x_n_s = x_s + np.nan_to_num(n_step)
            fx_n, c_e_n, c_i_n, idx_n = evaluate_true_all(x_n_s)
            l_i_n = l_i_at(x_n_s)
            took_normal = True
        theta_n = theta_of(l_i_n, c_e_n, c_i_n)

        # ---- criticality measure at x+n
        omega, d = get_criticality(x_s, x_n_s, l_i_n, fx_n, delta)

        theta_k_zero = viol_zero(theta_k)
        theta_n_zero = viol_zero(theta_n)

        # ---- early CRITICAL exit (``algorithm.jl:728-732``)
        if theta_n_zero and omega_tests(omega, delta):
            stop_code = CRITICAL
            iter_counter += 1
            break

        # ---- criticality routine with per-pass rebuilds (``:523-613``)
        fully_lin = fully_linear_all()
        enter = (theta_k_zero and omega <= eps_crit
                 and ((not fully_lin) or delta > mu * omega))
        if enter:
            delta0 = delta
            if not fully_lin:
                # make-fully-linear pre-step (``:536-551``)
                update_models(x_s, x_idx, delta0, efl=True)
                omega, d = get_criticality(x_s, x_n_s, l_i_n, fx_n, delta0)
                fully_lin = fully_linear_all()
                do_loops = fully_lin and (delta0 > mu * omega)
            else:
                do_loops = True
            if do_loops:
                exit_c = False
                n_loops = 0
                delta_loc = delta0
                while delta_loc > mu * omega:
                    if n_loops >= max_critical_loops or budget_exhausted():
                        exit_c = True
                        break
                    update_models(x_s, x_idx, delta0, efl=True)
                    omega, d = get_criticality(x_s, x_n_s, l_i_n, fx_n,
                                               delta0)
                    fully_lin = fully_linear_all()
                    delta_loc = gamma_crit * delta_loc
                    n_loops += 1
                    if (delta_loc <= delta_tol_abs
                            or omega_tests(omega, delta_loc)
                            or not fully_lin):
                        exit_c = True
                        break
                beta_eff = max(beta, mu)
                delta = min(delta0, max(beta_eff * omega, delta_loc))
                if exit_c:
                    stop_code = CRITICAL
                    iter_counter += 1
                    break

        # ---- trial point (``_trial_point``)
        if descent == "ps":
            x_trial_s = d  # the PS payload IS the trial point
        else:
            lb_eff = np.maximum(lb_s, x_s - delta)
            ub_eff = np.minimum(ub_s, x_s + delta)
            delta_eff = (_intersect_pos(x_n_s, d, lb_eff, ub_eff)
                         if took_normal else delta)
            norm_d = float(np.max(np.abs(d)))
            norm_d_safe = norm_d if norm_d > 0 else 1.0
            if delta_eff <= 1.0:
                sigma = min(delta_eff / norm_d_safe, 1.0)
            else:
                sigma = (_intersect_pos(x_n_s, d, lb_eff, ub_eff)
                         if np.isclose(norm_d, 1.0) else 1.0)

            mx_n = model_obj(x_n_s)     # counted for exact obj groups
            K = MAX_LOOPS + 1
            k = 0
            while True:
                sig_k = sigma * ARMIJO_SHRINK ** k
                mx_k = model_obj(x_n_s + sig_k * d)
                if strict_acceptance_test:
                    ok = bool(np.all(mx_n - mx_k
                                     >= sig_k * ARMIJO_C * omega))
                else:
                    ok = (np.max(mx_n) - np.max(mx_k)
                          ) >= sig_k * ARMIJO_C * omega
                if ok or sig_k <= MIN_STEPSIZE or k == K - 1:
                    break
                k += 1
            x_trial_s = x_n_s + (sigma * ARMIJO_SHRINK ** k) * d
            if not (sigma > MIN_STEPSIZE):
                x_trial_s = x_n_s
                omega = 0.0

        fx_t, c_e_t, c_i_t, idx_t = evaluate_true_all(x_trial_s)
        l_i_t = l_i_at(x_trial_s)
        mx_x = model_obj(x_s)
        mx_t = model_obj(x_trial_s)

        theta_t = theta_of(l_i_t, c_e_t, c_i_t)
        steplength = float(np.max(np.abs(x_s - x_trial_s)))

        # ---- acceptance tests (``:779-863``)
        if filt is None:
            acceptable_filter = True
        else:
            acceptable_filter = filt.acceptable_vs(
                theta_t, float(np.max(fx_t)), theta_k, float(np.max(fx)))

        if strict_acceptance_test:
            denom = mx_x - mx_t
            if np.any(denom == 0):
                rho = -np.inf
            else:
                rho = float(np.min((fx - fx_t) / denom))
        else:
            denom = np.array([np.max(mx_x) - np.max(mx_t)])
            with np.errstate(divide="ignore", invalid="ignore"):
                r_ = (np.max(fx) - np.max(fx_t)) / denom[0]
            rho = -np.inf if np.isnan(r_) else float(r_)
        if not acceptable_filter:
            rho = -np.inf
        good_decrease = acceptable_filter and bool(
            np.all(denom >= filter_kappa_psi * theta_k ** filter_psi))
        fully_lin = fully_linear_all()

        if acceptable_filter:
            if good_decrease:
                if rho >= nu_success:
                    it_stat, accept = SUCCESSFULL, True
                    ru = (RU_GROW if delta < max(beta, mu) * omega
                          else RU_LEAVE)
                elif fully_lin:
                    if rho >= nu_accept:
                        it_stat, accept, ru = ACCEPTABLE, True, RU_SHRINK
                    else:
                        it_stat, accept, ru = (INACCEPTABLE, False,
                                               RU_SHRINK_MUCH)
                else:
                    it_stat, accept, ru = MODELIMPROVING, False, RU_LEAVE
            else:
                it_stat, accept = FILTER_ADD, True
                ru = RU_GROW if rho >= nu_success else RU_LEAVE
        else:
            it_stat, accept, ru = FILTER_FAIL, False, RU_SHRINK_MUCH

        if it_stat == FILTER_ADD and filt is not None:
            filt.add(theta_t, float(np.max(fx_t)))

        # ``do_radius_update`` (``algorithm.jl:140-196``)
        if radius_update_method == "standard":
            grow = min(delta_max, gamma_grow * delta)
            shrink = delta * gamma_shrink
            shrink_much = delta * gamma_shrink_much
        else:  # 'steplength'
            grow = min(delta_max, (gamma_grow + steplength / delta) * delta)
            shrink = steplength * gamma_shrink
            shrink_much = steplength * gamma_shrink_much
        if ru == RU_GROW:
            delta_new = grow
        elif ru == RU_SHRINK:
            delta_new = shrink
        elif ru == RU_SHRINK_MUCH:
            delta_new = shrink_much
        else:
            delta_new = delta

        x_old, fx_old = x, fx
        if accept:
            x, x_s = from_s(x_trial_s), x_trial_s
            fx, c_e, c_i = fx_t, c_e_t, c_i_t
            l_i = l_i_t
            x_idx = idx_t
        else:
            x, x_s = from_s(x_n_s), x_n_s
            fx, c_e, c_i = fx_n, c_e_n, c_i_n
            l_i = l_i_at(x_n_s)
            x_idx = idx_n
        delta = delta_new

        stamp(x, fx, delta_new, rho, omega, steplength, it_stat, x_idx)

        if (not accept) and steplength <= stepnorm_tol_abs:
            stop_code = TOLERANCE
        elif accept and tol_tests(x_old, from_s(x_trial_s), fx_old, fx_t):
            stop_code = TOLERANCE
        last_it_stat = it_stat
        iter_counter += 1

    R.x, R.fx = x, fx
    R.stop_code = stop_code
    R.n_iterations = iter_counter - 1
    R.group_evals = [g.n_evals for g in G]
    R.dbs = [[(np.array(xr), (np.array(yr) if ev else None))
              for xr, yr, ev in zip(g.db.X, g.db.Y, g.db.evaluated)]
             for g in G]
    return R


# ================================================================== Lagrange
def lag_exponents(n, degree):
    """Monomial exponent rows in degree-ascending order
    (``non_negative_ineq_solutions``, ``LagrangeModel.jl:163-166``)."""
    import itertools
    rows = []
    for d in range(degree + 1):
        for combo in itertools.combinations_with_replacement(range(n), d):
            e = np.zeros(n, dtype=int)
            for i in combo:
                e[i] += 1
            rows.append(e)
    return np.stack(rows)


def lag_phi(E, u):
    terms = np.where(E == 0, 1.0, np.where(E == 1, u[None, :],
                                           u[None, :] * u[None, :]))
    return np.prod(terms, axis=1)


def lag_dphi(E, u):
    """(p, n) derivative of the monomial vector (degree <= 2)."""
    p, n = E.shape
    out = np.zeros((p, n))
    for j in range(n):
        dterm = np.where(E[:, j] == 0, 0.0,
                         np.where(E[:, j] == 1, 1.0, 2.0 * u[j]))
        others = np.where(E == 0, 1.0, np.where(E == 1, u[None, :],
                                                u[None, :] * u[None, :]))
        others = others.copy()
        others[:, j] = 1.0
        out[:, j] = dterm * np.prod(others, axis=1)
    return out


def lag_maximize_abs(b_row, E, grid, iters, n_starts, extra=None):
    """max |b @ phi(u)| over [0,1]^n — grid sweep + top-k multistart PGA
    (the ``maximize_in_box`` mirror: monotone accept, eta *= 1.5 / 0.5)."""
    pts = grid if extra is None else np.concatenate([extra, grid])
    vals = np.abs(lag_phi_batch(E, pts) @ b_row)
    k = min(max(n_starts, 1), pts.shape[0])
    order = np.argsort(-vals, kind="stable")[:k]
    X = pts[order].copy()
    F = vals[order].copy()
    eta = np.full(k, 0.1)          # step0 * width, width = 1
    for _ in range(iters):
        for s in range(k):
            v = lag_phi(E, X[s]) @ b_row
            g = np.sign(v) * (lag_dphi(E, X[s]).T @ b_row)
            x_try = np.clip(X[s] + eta[s] * g, 0.0, 1.0)
            f_try = abs(lag_phi(E, x_try) @ b_row)
            if f_try > F[s]:
                X[s], F[s] = x_try, f_try
                eta[s] *= 1.5
            else:
                eta[s] *= 0.5
    best = int(np.argmax(F))
    return X[best], F[best]


def lag_phi_batch(E, U):
    return np.stack([lag_phi(E, u) for u in U])


def lag_orthogonalize(E, B, u, i):
    """Normalize row i at u, sweep out of the others
    (``orthogonalize_polys``, ``LagrangeModel.jl:184-190``)."""
    phi = lag_phi(E, u)
    vals = B @ phi
    denom = vals[i] if abs(vals[i]) > 0 else 1.0
    bi = B[i] / denom
    B = B - np.outer(vals, bi)
    B[i] = bi
    return B
