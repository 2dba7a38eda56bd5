"""Unbounded LP with a primal ray (reference: examples/unbounded.jl).

    min  -x1 - x2   s.t.  x1 - x2 = 1,  x >= 0   -> unbounded
"""

import tulip_tpu as tlp


def main():
    m = tlp.Model()
    m.params.OutputLevel = 1
    pb = m.pbdata
    x1 = pb.add_variable((), (), -1.0, 0.0, float("inf"), "x1")
    x2 = pb.add_variable((), (), -1.0, 0.0, float("inf"), "x2")
    pb.add_constraint([x1, x2], [1.0, -1.0], 1.0, 1.0)

    st = m.optimize()
    assert st == tlp.TerminationStatus.DUAL_INFEASIBLE
    sol = m.solution
    assert sol.is_primal_ray
    print(f"status={st.name}; unbounded ray x={sol.x}")
    # Ray: A x ~ 0, c'x < 0, x >= 0.
    assert abs(sol.x[0] - sol.x[1]) < 1e-6 * max(1.0, abs(sol.x[0]))
    assert -(sol.x[0] + sol.x[1]) < 0


if __name__ == "__main__":
    main()
