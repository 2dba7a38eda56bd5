"""Bounded LP solved to optimality (reference: examples/optimal.jl).

    min  x1 + 2 x2
    s.t. x1 + x2 = 1
         x1 - x2 = 0
         0 <= x1, x2 <= 1     ->  z* = 1.5 at (0.5, 0.5)
"""

import tulip_tpu as tlp


def main():
    m = tlp.Model()
    m.params.OutputLevel = 1
    pb = m.pbdata
    x1 = pb.add_variable((), (), 1.0, 0.0, 1.0, "x1")
    x2 = pb.add_variable((), (), 2.0, 0.0, 1.0, "x2")
    pb.add_constraint([x1, x2], [1.0, 1.0], 1.0, 1.0, "r1")
    pb.add_constraint([x1, x2], [1.0, -1.0], 0.0, 0.0, "r2")

    st = m.optimize()
    assert st == tlp.TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    print(f"status={st.name} objective={z:.9f} x={m.solution.x}")
    y = m.solution.y_lower - m.solution.y_upper
    print(f"row duals y={y}")
    assert abs(z - 1.5) < 1e-7


if __name__ == "__main__":
    main()
