"""Presolve driver (pass-through skeleton).

Pipeline contract (reference: src/Presolve/Presolve.jl:93-463):

- ``PresolveData(pb, opts)`` builds a workspace over the original problem.
- ``ps.presolve()`` applies reduction rules in a fixpoint pass loop and
  returns a TerminationStatus — UNKNOWN when the reduced problem still needs
  the IPM, or a terminal status when presolve solved/detected
  in/unboundedness (then ``ps.solution`` holds the (partial) solution).
- ``ps.extract_reduced_problem()`` returns the reduced ProblemData.
- ``postsolve(sol_outer, sol_inner, ps)`` maps a reduced-space solution back
  to the original space, replaying the undo stack in reverse.
"""

from __future__ import annotations

from typing import List, Optional

from ..problem import ProblemData
from ..solution import Solution
from ..status import TerminationStatus


class PresolveData:
    def __init__(self, pb: ProblemData, opts=None):
        self.pb0 = pb
        self.opts = opts
        self.status = TerminationStatus.NOT_CALLED
        self.ops: List = []  # undo stack
        self.solution: Optional[Solution] = None
        self.pb_red: Optional[ProblemData] = None

        self.nrow = pb.ncon
        self.ncol = pb.nvar

    def presolve(self) -> TerminationStatus:
        # Pass-through: no reductions yet.
        self.status = TerminationStatus.UNKNOWN
        return self.status

    def extract_reduced_problem(self) -> ProblemData:
        self.pb_red = self.pb0
        return self.pb_red


def postsolve(sol_outer: Solution, sol_inner: Solution,
              ps: PresolveData) -> None:
    """Map the reduced-space solution back to the original space
    (reference: src/Presolve/Presolve.jl:321-366)."""
    # Pass-through: identical spaces.
    sol_outer.primal_status = sol_inner.primal_status
    sol_outer.dual_status = sol_inner.dual_status
    sol_outer.is_primal_ray = sol_inner.is_primal_ray
    sol_outer.is_dual_ray = sol_inner.is_dual_ray
    sol_outer.z_primal = sol_inner.z_primal
    sol_outer.z_dual = sol_inner.z_dual
    sol_outer.x[:] = sol_inner.x
    sol_outer.Ax[:] = sol_inner.Ax
    sol_outer.y_lower[:] = sol_inner.y_lower
    sol_outer.y_upper[:] = sol_inner.y_upper
    sol_outer.s_lower[:] = sol_inner.s_lower
    sol_outer.s_upper[:] = sol_inner.s_upper
