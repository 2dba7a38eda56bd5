"""LP whose variables are all free (reference: examples/freevars.jl).

    min    x1 +   x2 + x3
    s.t. 2 x1 +   x2      >= 2
           x1 + 2 x2      >= 2
           x1 +   x2 + x3 >= 0      x free  ->  z* = 0
"""

import tulip_tpu as tlp

INF = float("inf")


def main():
    m = tlp.Model()
    m.params.OutputLevel = 1
    pb = m.pbdata
    x1 = pb.add_variable((), (), 1.0, -INF, INF, "x1")
    x2 = pb.add_variable((), (), 1.0, -INF, INF, "x2")
    x3 = pb.add_variable((), (), 1.0, -INF, INF, "x3")
    pb.add_constraint([x1, x2], [2.0, 1.0], 2.0, INF, "r1")
    pb.add_constraint([x1, x2], [1.0, 2.0], 2.0, INF, "r2")
    pb.add_constraint([x1, x2, x3], [1.0, 1.0, 1.0], 0.0, INF, "r3")

    st = m.optimize()
    assert st == tlp.TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    x = m.solution.x
    print(f"status={st.name} objective={z:.9f} x={x}")
    assert abs(z) < 1e-6
    # Primal feasibility (the solution is not unique).
    assert 2 * x[0] + x[1] >= 2 - 1e-6
    assert x[0] + 2 * x[1] >= 2 - 1e-6
    assert x[0] + x[1] + x[2] >= -1e-6
    # Free variables carry zero reduced cost.
    s = m.solution.s_lower - m.solution.s_upper
    assert all(abs(v) < 1e-6 for v in s)


if __name__ == "__main__":
    main()
