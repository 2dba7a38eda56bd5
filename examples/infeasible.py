"""Primal-infeasible LP with a Farkas certificate
(reference: examples/infeasible.jl).

    min  x1 + x2
    s.t. x1 + x2 = 1 ; x1 - x2 = 0 ; x2 = 1 ; x >= 0   -> infeasible
"""

import tulip_tpu as tlp


def main():
    m = tlp.Model()
    m.params.OutputLevel = 1
    pb = m.pbdata
    x1 = pb.add_variable((), (), 1.0, 0.0, float("inf"), "x1")
    x2 = pb.add_variable((), (), 1.0, 0.0, float("inf"), "x2")
    pb.add_constraint([x1, x2], [1.0, 1.0], 1.0, 1.0)
    pb.add_constraint([x1, x2], [1.0, -1.0], 0.0, 0.0)
    pb.add_constraint([x2], [1.0], 1.0, 1.0)

    st = m.optimize()
    assert st == tlp.TerminationStatus.PRIMAL_INFEASIBLE
    sol = m.solution
    assert sol.is_dual_ray
    y = sol.y_lower - sol.y_upper
    print(f"status={st.name}; Farkas dual ray y={y}")
    # Certificate inequality: b'y > 0 with A'y <= 0 componentwise on the
    # cone of the bounds.
    val = 1.0 * y[0] + 0.0 * y[1] + 1.0 * y[2]
    print(f"certificate value b'y = {val:.6f} > 0")
    assert val > 0


if __name__ == "__main__":
    main()
