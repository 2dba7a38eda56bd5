"""scipy.optimize.linprog-compatible one-shot entry point.

Eases migration for users coming from scipy (and doubles as the simplest
programmatic surface):

    from tulip_tpu import linprog
    res = linprog(c, A_ub=..., b_ub=..., A_eq=..., b_eq=..., bounds=...)
    res.x, res.fun, res.status, res.success
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .model import Model
from .params import Parameters
from .problem import INF
from .status import TerminationStatus


@dataclasses.dataclass
class LinprogResult:
    x: np.ndarray
    fun: float
    success: bool
    status: int            # 0 optimal, 1 iter limit, 2 infeasible,
    # 3 unbounded, 4 numerical (scipy convention)
    message: str
    nit: int
    # Extras beyond scipy:
    termination: TerminationStatus
    y: Optional[np.ndarray] = None      # row duals (eq then ub rows)
    s: Optional[np.ndarray] = None      # bound reduced costs


_STATUS_MAP = {
    TerminationStatus.OPTIMAL: (0, "Optimization terminated successfully."),
    TerminationStatus.ITERATION_LIMIT: (1, "Iteration limit reached."),
    TerminationStatus.TIME_LIMIT: (1, "Time limit reached."),
    TerminationStatus.PRIMAL_INFEASIBLE: (2, "Problem is infeasible."),
    TerminationStatus.DUAL_INFEASIBLE: (3, "Problem is unbounded."),
    TerminationStatus.NUMERICAL_PROBLEM: (4, "Numerical difficulties."),
}


def linprog(c, A_ub=None, b_ub=None, A_eq=None, b_eq=None,
            bounds: Optional[Sequence] = None, *,
            params: Optional[Parameters] = None) -> LinprogResult:
    """Minimize ``c @ x`` s.t. ``A_ub x <= b_ub``, ``A_eq x = b_eq``,
    ``bounds[j] = (lb, ub)`` (default ``(0, None)`` like scipy)."""
    c = np.atleast_1d(np.asarray(c, dtype=float))
    n = c.shape[0]

    m = Model(params)
    pb = m.pbdata
    if bounds is None:
        bounds = [(0.0, None)] * n
    elif len(bounds) == 2 and np.isscalar(bounds[0]):
        bounds = [tuple(bounds)] * n
    for j in range(n):
        lb, ub = bounds[j]
        pb.add_variable((), (), c[j],
                        -INF if lb is None else float(lb),
                        INF if ub is None else float(ub))

    def add_rows(A, b, is_eq):
        if A is None:
            return 0
        A = np.atleast_2d(np.asarray(A, dtype=float))
        b = np.atleast_1d(np.asarray(b, dtype=float))
        for i in range(A.shape[0]):
            cols = np.nonzero(A[i])[0]
            vals = A[i, cols]
            if is_eq:
                pb.add_constraint(cols.tolist(), vals.tolist(), b[i], b[i])
            else:
                pb.add_constraint(cols.tolist(), vals.tolist(), -INF, b[i])
        return A.shape[0]

    add_rows(A_eq, b_eq, True)
    add_rows(A_ub, b_ub, False)

    st = m.optimize()
    code, msg = _STATUS_MAP.get(st, (4, st.name))
    sol = m.solution
    x = sol.x.copy() if sol is not None else np.full(n, np.nan)
    from .api import get_attribute
    fun = (get_attribute(m, "ObjectiveValue")
           if st == TerminationStatus.OPTIMAL else np.nan)
    return LinprogResult(
        x=x, fun=fun, success=st == TerminationStatus.OPTIMAL,
        status=code, message=msg, nit=m.barrier_iterations,
        termination=st,
        y=(sol.y_lower - sol.y_upper) if sol is not None else None,
        s=(sol.s_lower - sol.s_upper) if sol is not None else None,
    )
