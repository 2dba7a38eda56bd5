"""Golden LP generators — classic families standing in for Netlib (which
cannot be fetched in a zero-egress environment). Each returns a populated
ProblemData plus metadata; optima are validated against scipy HiGHS."""

from __future__ import annotations

import numpy as np

from tulip_tpu.problem import INF, ProblemData


def transportation(ns=6, nd=9, seed=0) -> ProblemData:
    """Balanced transportation problem: degenerate equality LP.

    min sum c_ij x_ij  s.t.  sum_j x_ij = s_i,  sum_i x_ij = d_j,  x >= 0.
    """
    rng = np.random.default_rng(seed)
    s = rng.integers(10, 50, ns).astype(float)
    d = rng.random(nd)
    d = np.floor(d / d.sum() * s.sum())
    d[-1] += s.sum() - d.sum()
    C = rng.uniform(1, 20, (ns, nd))

    pb = ProblemData(f"transport-{ns}x{nd}")
    idx = {}
    for i in range(ns):
        for j in range(nd):
            idx[i, j] = pb.add_variable((), (), C[i, j], 0.0, INF,
                                        f"x{i}_{j}")
    for i in range(ns):
        cols = [idx[i, j] for j in range(nd)]
        pb.add_constraint(cols, [1.0] * nd, s[i], s[i], f"supply{i}")
    for j in range(nd):
        cols = [idx[i, j] for i in range(ns)]
        pb.add_constraint(cols, [1.0] * ns, d[j], d[j], f"demand{j}")
    return pb


def production(np_=8, nr=5, seed=1) -> ProblemData:
    """Production planning: max profit with resource capacities (<= rows),
    solved as a MAX problem (exercises the objective flip)."""
    rng = np.random.default_rng(seed)
    profit = rng.uniform(5, 30, np_)
    use = rng.uniform(0.5, 4.0, (nr, np_))
    cap = use @ rng.uniform(2, 8, np_)

    pb = ProblemData(f"production-{np_}x{nr}")
    pb.objsense = False  # maximize
    for j in range(np_):
        pb.add_variable((), (), profit[j], 0.0, INF, f"p{j}")
    for i in range(nr):
        pb.add_constraint(list(range(np_)), list(use[i]), -INF, cap[i],
                          f"res{i}")
    return pb


def blending(seed=2) -> ProblemData:
    """Diet/blending with ranges and two-sided variable bounds."""
    rng = np.random.default_rng(seed)
    n = 10
    cost = rng.uniform(1, 10, n)
    nutr = rng.uniform(0, 5, (4, n))
    pb = ProblemData("blending")
    for j in range(n):
        pb.add_variable((), (), cost[j], 0.0, rng.uniform(2, 5), f"f{j}")
    x_mid = np.full(n, 1.0)
    mid = nutr @ x_mid
    for i in range(4):
        pb.add_constraint(list(range(n)), list(nutr[i]),
                          0.6 * mid[i], 1.6 * mid[i], f"n{i}")
    pb.add_constraint(list(range(n)), [1.0] * n, 5.0, 15.0, "total")
    return pb


def free_vars_lp(seed=3) -> ProblemData:
    """Mixed free/bounded variables with >= and <= rows. The objective is
    built dual-feasibly (c = A'y + s with sign-correct y, s) so the problem
    is guaranteed bounded despite the free variables."""
    rng = np.random.default_rng(seed)
    m_, n = 6, 12
    A = rng.standard_normal((m_, n))
    x0 = rng.standard_normal(n)
    b = A @ x0
    # Row i is >= for even i (dual y_i >= 0), <= for odd i (y_i <= 0).
    y = np.array([rng.uniform(0.1, 1.0) * (1 if i % 2 == 0 else -1)
                  for i in range(m_)])
    s = np.zeros(n)
    lo = np.empty(n)
    hi = np.empty(n)
    for j in range(n):
        if j % 3 == 0:
            lo[j], hi[j] = -INF, INF      # free: s_j must be 0
        elif j % 3 == 1:
            lo[j], hi[j] = -5.0, 5.0      # boxed: any s_j
            s[j] = rng.standard_normal()
        else:
            lo[j], hi[j] = 0.0, INF       # lower-bounded: s_j >= 0
            s[j] = rng.uniform(0.1, 1.0)
    c = A.T @ y + s
    pb = ProblemData("freemix")
    for j in range(n):
        pb.add_variable((), (), c[j], lo[j], hi[j])
    for i in range(m_):
        if i % 2 == 0:
            pb.add_constraint(list(range(n)), list(A[i]), b[i], INF)
        else:
            pb.add_constraint(list(range(n)), list(A[i]), -INF, b[i])
    return pb


def degenerate_lp(seed=4) -> ProblemData:
    """Highly degenerate: duplicated rows and columns."""
    rng = np.random.default_rng(seed)
    m_, n = 4, 8
    A = rng.standard_normal((m_, n))
    A = np.vstack([A, A[0:2]])          # duplicate rows
    u = rng.uniform(1, 3, n)
    x0 = u * 0.5
    b = A @ x0
    c = rng.standard_normal(n)
    pb = ProblemData("degenerate")
    for j in range(n):
        pb.add_variable((), (), c[j], 0.0, u[j])
    for i in range(A.shape[0]):
        pb.add_constraint(list(range(n)), list(A[i]), b[i], b[i])
    return pb


def ill_scaled(seed=6) -> ProblemData:
    """Badly scaled LP (coefficients spanning 1e-4..1e4): exercises the
    2-norm equilibration and the regularization ladder."""
    rng = np.random.default_rng(seed)
    m_, n = 5, 10
    col_scale = 10.0 ** rng.uniform(-4, 4, n)
    row_scale = 10.0 ** rng.uniform(-2, 2, m_)
    A = rng.standard_normal((m_, n)) * col_scale[None, :] * row_scale[:, None]
    u = rng.uniform(1, 3, n) / col_scale
    x0 = u * rng.uniform(0.3, 0.7, n)
    b = A @ x0
    c = rng.standard_normal(n) * col_scale
    pb = ProblemData("illscaled")
    for j in range(n):
        pb.add_variable((), (), c[j], 0.0, u[j])
    for i in range(m_):
        pb.add_constraint(list(range(n)), list(A[i]), b[i], b[i])
    return pb


def assignment(nw=7, seed=7) -> ProblemData:
    """Assignment problem (totally unimodular network LP): the LP optimum
    is integral and heavily primal-degenerate."""
    rng = np.random.default_rng(seed)
    C = rng.uniform(1, 9, (nw, nw))
    pb = ProblemData(f"assignment-{nw}")
    idx = {}
    for i in range(nw):
        for j in range(nw):
            idx[i, j] = pb.add_variable((), (), C[i, j], 0.0, INF)
    for i in range(nw):
        pb.add_constraint([idx[i, j] for j in range(nw)], [1.0] * nw,
                          1.0, 1.0, f"agent{i}")
    for j in range(nw):
        pb.add_constraint([idx[i, j] for i in range(nw)], [1.0] * nw,
                          1.0, 1.0, f"task{j}")
    return pb


def max_flow(nn=8, seed=8) -> ProblemData:
    """Max-flow on a random DAG as an LP (max sense, conservation
    equalities, capacity bounds as variable upper bounds)."""
    rng = np.random.default_rng(seed)
    # Random DAG edges i -> j for i < j; ensure source(0)/sink(nn-1) paths.
    edges = [(i, j) for i in range(nn - 1) for j in range(i + 1, nn)
             if j == i + 1 or rng.random() < 0.45]
    cap = {e: float(rng.uniform(1, 10)) for e in edges}
    pb = ProblemData(f"maxflow-{nn}")
    eidx = {}
    for e in edges:
        eidx[e] = pb.add_variable((), (), 0.0, 0.0, cap[e],
                                  f"f{e[0]}_{e[1]}")
    # Objective: maximize flow out of the source.
    pb.objsense = False
    for e in edges:
        if e[0] == 0:
            pb.obj[eidx[e]] = 1.0
    for v in range(1, nn - 1):
        cols = [eidx[e] for e in edges if v in e]
        vals = [1.0 if e[1] == v else -1.0 for e in edges if v in e]
        pb.add_constraint(cols, vals, 0.0, 0.0, f"cons{v}")
    return pb


def multiperiod(nt=12, seed=9) -> ProblemData:
    """Multiperiod production/inventory staircase: period-linking balance
    equalities give a banded standard form (exercises the structured
    backends' RCM/banded plans when solved through them)."""
    rng = np.random.default_rng(seed)
    demand = rng.uniform(2, 8, nt)
    pcost = rng.uniform(1, 4, nt)
    hcost = rng.uniform(0.1, 0.5, nt)
    cap = demand.max() * 1.6
    pb = ProblemData(f"multiperiod-{nt}")
    pidx = [pb.add_variable((), (), pcost[t], 0.0, cap, f"p{t}")
            for t in range(nt)]
    sidx = [pb.add_variable((), (), hcost[t], 0.0, INF, f"s{t}")
            for t in range(nt)]
    for t in range(nt):
        if t == 0:
            pb.add_constraint([pidx[0], sidx[0]], [1.0, -1.0],
                              demand[0], demand[0], "bal0")
        else:
            pb.add_constraint([sidx[t - 1], pidx[t], sidx[t]],
                              [1.0, 1.0, -1.0], demand[t], demand[t],
                              f"bal{t}")
    return pb


def narrow_cone(seed=10) -> ProblemData:
    """Nearly parallel constraints (interior narrows to a sliver): stresses
    step-length control and the centrality corrections."""
    rng = np.random.default_rng(seed)
    n = 6
    base = rng.standard_normal(n)
    base /= np.linalg.norm(base)
    pb = ProblemData("narrowcone")
    for j in range(n):
        pb.add_variable((), (), float(base[j] + 0.01 * rng.standard_normal()),
                        -10.0, 10.0)
    x0 = rng.uniform(-1, 1, n)
    for k in range(8):
        a = base + 1e-3 * rng.standard_normal(n)
        rhs = float(a @ x0)
        pb.add_constraint(list(range(n)), list(a), rhs - 0.05, rhs + 0.05,
                          f"slab{k}")
    return pb


def to_scipy(pb: ProblemData):
    """(c, A_ub, b_ub, A_eq, b_eq, bounds, sense) for scipy.linprog."""
    n = pb.nvar
    A = pb.to_dense()
    c = np.asarray(pb.obj, dtype=float)
    sense = 1.0 if pb.objsense else -1.0
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(pb.ncon):
        lb, ub = pb.lcon[i], pb.ucon[i]
        if lb == ub:
            A_eq.append(A[i])
            b_eq.append(lb)
        else:
            if np.isfinite(ub):
                A_ub.append(A[i])
                b_ub.append(ub)
            if np.isfinite(lb):
                A_ub.append(-A[i])
                b_ub.append(-lb)
    bounds = [(pb.lvar[j] if np.isfinite(pb.lvar[j]) else None,
               pb.uvar[j] if np.isfinite(pb.uvar[j]) else None)
              for j in range(n)]
    return (sense * c,
            np.asarray(A_ub) if A_ub else None,
            np.asarray(b_ub) if b_ub else None,
            np.asarray(A_eq) if A_eq else None,
            np.asarray(b_eq) if b_eq else None,
            bounds, sense)


def scipy_optimum(pb: ProblemData) -> float:
    """Reference optimum (original sense) via HiGHS."""
    from scipy.optimize import linprog

    c, A_ub, b_ub, A_eq, b_eq, bounds, sense = to_scipy(pb)
    r = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                bounds=bounds, method="highs")
    assert r.status == 0, f"HiGHS failed on {pb.name}: {r.message}"
    return sense * r.fun + pb.obj0


ALL_GOLDEN = [transportation, production, blending, free_vars_lp,
              degenerate_lp, ill_scaled,
              assignment, max_flow, multiperiod, narrow_cone]

# Objective-parity tolerance per family: 1e-8 by default (Tulip-default
# tolerances), looser for the deliberately singular/degenerate and
# ill-scaled families where regularization/conditioning bound attainable
# accuracy (the reference's own example checks use 100*sqrt(eps) ≈ 1.5e-6,
# examples/optimal.jl:11-12).
PARITY_RTOL = {"degenerate": 1e-6, "illscaled": 1e-6, "narrowcone": 1e-6}
