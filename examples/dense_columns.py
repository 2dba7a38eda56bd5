"""Dense linking columns: the case where sparse K1 factorization dies.

A staircase LP with one global linking column (think: a shared resource
every period draws on). Its column of A is fully dense, so the normal
matrix K1 = AΘAᵀ fills completely and any sparse K1 factorization
degenerates to dense. The reference handles this by defaulting to
CHOLMOD LDLᵀ on the augmented system (reference: src/KKT/KKT.jl:134-141);
here the auto-probe routes it to the SMW splitting backend
(kkt/splitting.py): tiled sparse Cholesky on the staircase part plus a
rank-1 Sherman-Morrison-Woodbury correction for the dense column.

Run: python examples/dense_columns.py
"""

import numpy as np

import tulip_tpu as tlp


def main():
    rng = np.random.default_rng(5)
    stages, mr, nc = 10, 6, 9
    m = stages * mr
    n = stages * nc + nc
    A = np.zeros((m, n))
    for s in range(stages):
        A[s * mr:(s + 1) * mr, s * nc:(s + 2) * nc] = \
            rng.standard_normal((mr, 2 * nc))
    A[:, 4] = rng.standard_normal(m)          # the dense linking column
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    b = A @ x0
    c = rng.standard_normal(n)

    # Force the splitting backend explicitly (the auto-probe only engages
    # at m >= 2048 to keep small problems on the dense fast path).
    m_ = tlp.Model()
    coo_i, coo_j = np.nonzero(A)
    m_.pbdata.load(True, c, 0.0, (coo_i, coo_j, A[coo_i, coo_j]),
                   b, b, np.zeros(n), u, name="densecol")
    m_.params.KKT.Backend = "sparse-smw"
    m_.params.KKT.RefinementSteps = 2
    st = m_.optimize()
    z = tlp.get_attribute(m_, "ObjectiveValue")
    print(f"status={st.name} objective={z:.9f} "
          f"iters={m_.barrier_iterations} backend={m_.kkt_backend.name}")

    # Same LP through the augmented system (K2), the reference's default
    # route: the tiled signed blocked Cholesky confines the dense
    # column's fill to the trailing tiles instead of splitting it out.
    m2 = tlp.Model()
    m2.pbdata.load(True, c, 0.0, (coo_i, coo_j, A[coo_i, coo_j]),
                   b, b, np.zeros(n), u, name="densecol")
    m2.params.KKT.Backend = "sparse-ldl"
    m2.params.KKT.System = "K2"
    m2.params.KKT.RefinementSteps = 2
    st2 = m2.optimize()
    z2 = tlp.get_attribute(m2, "ObjectiveValue")
    print(f"status={st2.name} objective={z2:.9f} "
          f"iters={m2.barrier_iterations} backend={m2.kkt_backend.name}")

    from scipy.optimize import linprog
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    print(f"HiGHS     objective={r.fun:.9f}  "
          f"(|Δ| smw = {abs(z - r.fun):.2e}, ldl = {abs(z2 - r.fun):.2e})")


if __name__ == "__main__":
    main()
