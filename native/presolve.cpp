// Native presolve engine: the host-side reduction pass loop.
//
// Mirrors tulip_tpu/presolve/presolve.py (itself a faithful port of the
// reference semantics, reference: src/Presolve/Presolve.jl:31-710 and the
// per-rule files) rule for rule and scan for scan, so the Python and native
// engines produce IDENTICAL op streams, bounds, flags and certificates on
// the same input — the differential fuzz tests in
// tests/test_native_presolve.py assert exactly that.
//
// The engine runs the whole fixpoint pass loop in one call and exposes the
// result through a two-call query/emit protocol (like symbolic.cpp):
//   tlp_presolve_run(...)  -> opaque handle + output sizes
//   tlp_presolve_emit(...) -> flags, final bounds/objective, op log, cert
//   tlp_presolve_free(...)
//
// Op log encoding (tag stream in `oi` ints + `od` doubles, per op):
//   0 EmptyRow            oi [0, i]                          od [y]
//   1 EmptyColumn         oi [1, j]                          od [x, s]
//   2 FixedVariable       oi [2, j, k, idx*k]                od [x, c, val*k]
//   3 RowSingleton        oi [3, i, j, fl, fu]               od [aij]
//   4 DominatedRow        oi [4, i]                          od []
//   5 ForcingRow          oi [5, i, at_lower, nr, rowidx*nr,
//                             (clen, colidx*clen)*nr]        od [rowval*nr,
//                                                    (colval*clen)*nr,
//                                                    xs*nr, cs*nr]
//   6 FreeColSingleton    oi [6, i, j, nr, idx*nr]           od [l, u, aij,
//                                                               y, val*nr]
//   7 DominatedColumn     oi [7, j, k, idx*k]                od [x, cj, val*k]
//
// All indices are ORIGINAL-space (like the Python op records).

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

// TerminationStatus values (tulip_tpu/status.py).
constexpr int32_t TRM_UNKNOWN = 1;
constexpr int32_t TRM_OPTIMAL = 2;
constexpr int32_t TRM_PRIMAL_INFEASIBLE = 3;
constexpr int32_t TRM_DUAL_INFEASIBLE = 4;

struct Engine {
    int32_t m = 0, n = 0;
    // Row-wise and column-wise copies of A, in the SAME entry order as the
    // Python ProblemData's arows/acols (entries may include explicit zeros;
    // active iteration skips them exactly like _active_row/_active_col).
    std::vector<int32_t> rp, rj;
    std::vector<double> rv;
    std::vector<int32_t> cp, ci;
    std::vector<double> cv;

    std::vector<uint8_t> rowflag, colflag;
    std::vector<int32_t> nzrow, nzcol;
    std::vector<double> lrow, urow, lcol, ucol, obj;
    double obj0 = 0.0;
    std::vector<double> ly, uy;  // dual bounds on y

    double tol_pfeas = 0.0, tol_dfeas = 0.0;

    int32_t nrow = 0, ncol = 0;
    bool updated = false;
    int32_t status = TRM_UNKNOWN;
    std::vector<int32_t> row_singletons;

    std::vector<int32_t> oi;  // op log ints
    std::vector<double> od;   // op log doubles
    int32_t n_ops = 0;

    // Certificate record (original indices; -1 = unset).
    int32_t cert_kind = -1;  // 0 primal-infeasible, 1 dual-infeasible
    int32_t cert_row = -1, cert_col = -1;
    double cert_yl = 0, cert_yu = 0, cert_sl = 0, cert_su = 0, cert_x = 0;

    // ---- certificates (presolve.py:_primal_infeasible_cert/_dual_...) ----
    void primal_infeasible_cert(int32_t row, int32_t col, double yl,
                                double yu, double sl, double su) {
        status = TRM_PRIMAL_INFEASIBLE;
        updated = true;
        cert_kind = 0;
        cert_row = row;
        cert_col = col;
        cert_yl = yl; cert_yu = yu; cert_sl = sl; cert_su = su;
    }

    void dual_infeasible_cert(int32_t col, double x) {
        status = TRM_DUAL_INFEASIBLE;
        updated = true;
        cert_kind = 1;
        cert_col = col;
        cert_x = x;
    }

    // ---- rules (presolve.py:174-486) ---------------------------------
    void remove_empty_row(int32_t i) {
        if (!(rowflag[i] && nzrow[i] == 0)) return;
        double lb = lrow[i], ub = urow[i];
        if (ub < -tol_pfeas) {
            primal_infeasible_cert(i, -1, 0.0, 1.0, 0.0, 0.0);
            return;
        } else if (lb > tol_pfeas) {
            primal_infeasible_cert(i, -1, 1.0, 0.0, 0.0, 0.0);
            return;
        } else {
            oi.push_back(0); oi.push_back(i); od.push_back(0.0);
            ++n_ops;
        }
        updated = true;
        rowflag[i] = 0;
        --nrow;
    }

    void remove_empty_column(int32_t j) {
        if (!(colflag[j] && nzcol[j] == 0)) return;
        double lb = lcol[j], ub = ucol[j], cj = obj[j];
        if (cj > tol_dfeas) {
            if (std::isfinite(lb)) {
                obj0 += lb * cj;
                oi.push_back(1); oi.push_back(j);
                od.push_back(lb); od.push_back(cj);
                ++n_ops;
            } else {
                dual_infeasible_cert(j, -1.0);
                return;
            }
        } else if (cj < -tol_dfeas) {
            if (std::isfinite(ub)) {
                obj0 += ub * cj;
                oi.push_back(1); oi.push_back(j);
                od.push_back(ub); od.push_back(cj);
                ++n_ops;
            } else {
                dual_infeasible_cert(j, 1.0);
                return;
            }
        } else {
            double x = std::isfinite(lb) ? lb : (std::isfinite(ub) ? ub : 0.0);
            oi.push_back(1); oi.push_back(j);
            od.push_back(x); od.push_back(0.0);
            ++n_ops;
        }
        colflag[j] = 0;
        updated = true;
        --ncol;
    }

    void remove_fixed_variable(int32_t j) {
        if (!colflag[j]) return;
        double lb = lcol[j], ub = ucol[j];
        if (lb != ub) return;
        double cj = obj[j];

        // Active column snapshot (order = acols entry order).
        std::vector<int32_t> aidx;
        std::vector<double> aval;
        for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
            if (rowflag[ci[p]] && cv[p] != 0.0) {
                aidx.push_back(ci[p]);
                aval.push_back(cv[p]);
            }
        }

        colflag[j] = 0;
        --ncol;
        updated = true;
        oi.push_back(2); oi.push_back(j);
        oi.push_back(static_cast<int32_t>(aidx.size()));
        for (int32_t i : aidx) oi.push_back(i);
        od.push_back(lb); od.push_back(cj);
        for (double v : aval) od.push_back(v);
        ++n_ops;
        obj0 += cj * lb;

        for (size_t k = 0; k < aidx.size(); ++k) {
            int32_t i = aidx[k];
            double aij = aval[k];
            lrow[i] -= aij * lb;
            urow[i] -= aij * lb;
            nzrow[i] -= 1;
            if (nzrow[i] == 0) {
                remove_empty_row(i);
                if (status != TRM_UNKNOWN) return;
            } else if (nzrow[i] == 1) {
                row_singletons.push_back(i);
            }
        }
    }

    void remove_row_singleton(int32_t i) {
        if (!(rowflag[i] && nzrow[i] == 1)) return;
        int32_t j = -1;
        double aij = 0.0;
        int32_t count = 0;
        for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
            if (colflag[rj[p]] && rv[p] != 0.0) {
                ++count;
                if (count == 1) { j = rj[p]; aij = rv[p]; }
            }
        }
        if (count != 1) return;  // numerically empty — next pass

        double l, u;
        if (aij > 0) { l = lrow[i] / aij; u = urow[i] / aij; }
        else { l = urow[i] / aij; u = lrow[i] / aij; }

        double lb = lcol[j], ub = ucol[j];
        if (l > ub + tol_pfeas) {
            if (aij > 0)
                primal_infeasible_cert(i, j, 1.0, 0.0, 0.0, aij);
            else
                primal_infeasible_cert(i, j, 0.0, 1.0, 0.0, -aij);
            return;
        }
        if (u < lb - tol_pfeas) {
            if (aij > 0)
                primal_infeasible_cert(i, j, 0.0, 1.0, aij, 0.0);
            else
                primal_infeasible_cert(i, j, 1.0, 0.0, -aij, 0.0);
            return;
        }
        bool force_lower = l >= lb;
        bool force_upper = u <= ub;
        if (force_lower) lcol[j] = l;
        if (force_upper) ucol[j] = u;

        oi.push_back(3); oi.push_back(i); oi.push_back(j);
        oi.push_back(force_lower ? 1 : 0); oi.push_back(force_upper ? 1 : 0);
        od.push_back(aij);
        ++n_ops;
        rowflag[i] = 0;
        updated = true;
        --nrow;
        nzcol[j] -= 1;

        if (lcol[j] == ucol[j]) remove_fixed_variable(j);
    }

    void remove_forcing_row(int32_t i) {
        if (!rowflag[i]) return;
        if (nzrow[i] == 1) return;

        double l_ = 0.0, u_ = 0.0;
        for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
            int32_t j = rj[p];
            double aij = rv[p];
            if (!(colflag[j] && aij != 0.0)) continue;
            if (aij < 0) { l_ += aij * ucol[j]; u_ += aij * lcol[j]; }
            else { l_ += aij * lcol[j]; u_ += aij * ucol[j]; }
            if (!(std::isfinite(l_) || std::isfinite(u_))) break;
        }

        double l = lrow[i], u = urow[i];
        if (l <= l_ && u_ <= u) {
            // Dominated row.
            rowflag[i] = 0;
            updated = true;
            --nrow;
            oi.push_back(4); oi.push_back(i);
            ++n_ops;
            for (int32_t p = rp[i]; p < rp[i + 1]; ++p)
                if (colflag[rj[p]] && rv[p] != 0.0) nzcol[rj[p]] -= 1;
            return;
        }
        if (l_ == u || u_ == l) {
            bool at_lower = (l_ == u);
            // Active row snapshot.
            std::vector<int32_t> ridx;
            std::vector<double> rval;
            for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
                if (colflag[rj[p]] && rv[p] != 0.0) {
                    ridx.push_back(rj[p]);
                    rval.push_back(rv[p]);
                }
            }
            size_t nr = ridx.size();
            std::vector<std::vector<int32_t>> cols_idx(nr);
            std::vector<std::vector<double>> cols_val(nr);
            std::vector<double> xs(nr), cs(nr);
            for (size_t k = 0; k < nr; ++k) {
                int32_t j = ridx[k];
                double aij = rval[k];
                double xj;
                if (at_lower) xj = (aij > 0) ? lcol[j] : ucol[j];
                else xj = (aij > 0) ? ucol[j] : lcol[j];
                for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
                    if (rowflag[ci[p]] && cv[p] != 0.0) {
                        cols_idx[k].push_back(ci[p]);
                        cols_val[k].push_back(cv[p]);
                    }
                }
                xs[k] = xj;
                cs[k] = obj[j];
                for (size_t q = 0; q < cols_idx[k].size(); ++q) {
                    int32_t kk = cols_idx[k][q];
                    if (kk == i) continue;
                    double akj = cols_val[k][q];
                    nzrow[kk] -= 1;
                    lrow[kk] -= akj * xj;
                    urow[kk] -= akj * xj;
                    if (nzrow[kk] == 1) row_singletons.push_back(kk);
                }
                colflag[j] = 0;
                --ncol;
            }

            oi.push_back(5); oi.push_back(i); oi.push_back(at_lower ? 1 : 0);
            oi.push_back(static_cast<int32_t>(nr));
            for (int32_t j : ridx) oi.push_back(j);
            for (size_t k = 0; k < nr; ++k) {
                oi.push_back(static_cast<int32_t>(cols_idx[k].size()));
                for (int32_t kk : cols_idx[k]) oi.push_back(kk);
            }
            for (double v : rval) od.push_back(v);
            for (size_t k = 0; k < nr; ++k)
                for (double v : cols_val[k]) od.push_back(v);
            for (double v : xs) od.push_back(v);
            for (double v : cs) od.push_back(v);
            ++n_ops;
            rowflag[i] = 0;
            --nrow;
            updated = true;
        }
    }

    void remove_free_column_singleton(int32_t j) {
        if (!(colflag[j] && nzcol[j] == 1)) return;
        int32_t i = -1;
        double aij = 0.0;
        int32_t count = 0;
        for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
            if (rowflag[ci[p]] && cv[p] != 0.0) {
                ++count;
                if (count == 1) { i = ci[p]; aij = cv[p]; }
            }
        }
        if (count != 1) return;

        double lr = lrow[i], ur = urow[i];
        double l = lcol[j], u = ucol[j];
        if (std::isfinite(l) || std::isfinite(u)) {
            double l_, u_;
            if (aij > 0) {
                l_ = lr; u_ = ur;
                for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
                    int32_t k = rj[p];
                    double aik = rv[p];
                    if (!colflag[k] || k == j || aik == 0.0) continue;
                    if (aik > 0) { l_ -= aik * ucol[k]; u_ -= aik * lcol[k]; }
                    else { l_ -= aik * lcol[k]; u_ -= aik * ucol[k]; }
                }
                l_ /= aij; u_ /= aij;
            } else {
                l_ = ur; u_ = lr;
                for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
                    int32_t k = rj[p];
                    double aik = rv[p];
                    if (!colflag[k] || k == j || aik == 0.0) continue;
                    if (aik > 0) { l_ -= aik * lcol[k]; u_ -= aik * ucol[k]; }
                    else { l_ -= aik * ucol[k]; u_ -= aik * lcol[k]; }
                }
                l_ /= aij; u_ /= aij;
            }
            if (!(l <= l_ && l_ <= u_ && u_ <= u)) return;  // not implied free
        }

        double y = obj[j] / aij;
        // Infinite priced row bound -> objective unbounded along the
        // singleton direction (mirrors presolve.py; see its comment).
        double priced = (y >= 0) ? lr : ur;
        if (y != 0.0 && !std::isfinite(priced)) {
            dual_infeasible_cert(j, ((y > 0) ? -1.0 : 1.0) / aij);
            return;
        }
        obj0 += (y >= 0) ? y * lr : y * ur;
        std::vector<int32_t> rind;
        std::vector<double> rval;
        for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
            int32_t k = rj[p];
            double aik = rv[p];
            if (!colflag[k] || k == j || aik == 0.0) continue;
            rind.push_back(k);
            rval.push_back(aik);
            obj[k] -= y * aik;
            nzcol[k] -= 1;
        }

        oi.push_back(6); oi.push_back(i); oi.push_back(j);
        oi.push_back(static_cast<int32_t>(rind.size()));
        for (int32_t k : rind) oi.push_back(k);
        od.push_back(lr); od.push_back(ur); od.push_back(aij); od.push_back(y);
        for (double v : rval) od.push_back(v);
        ++n_ops;
        rowflag[i] = 0;
        colflag[j] = 0;
        --nrow;
        --ncol;
        updated = true;
    }

    void fix_column_at(int32_t j, double x, double cj) {
        if (lcol[j] > ucol[j]) {
            primal_infeasible_cert(-1, j, 0.0, 0.0, 1.0, 1.0);
            return;
        }
        obj0 += cj * x;
        std::vector<int32_t> aidx;
        std::vector<double> aval;
        for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
            if (rowflag[ci[p]] && cv[p] != 0.0) {
                aidx.push_back(ci[p]);
                aval.push_back(cv[p]);
            }
        }
        for (size_t k = 0; k < aidx.size(); ++k) {
            int32_t i = aidx[k];
            double aij = aval[k];
            lrow[i] -= aij * x;
            urow[i] -= aij * x;
            nzrow[i] -= 1;
            if (nzrow[i] == 1) row_singletons.push_back(i);
        }
        oi.push_back(7); oi.push_back(j);
        oi.push_back(static_cast<int32_t>(aidx.size()));
        for (int32_t i : aidx) oi.push_back(i);
        od.push_back(x); od.push_back(cj);
        for (double v : aval) od.push_back(v);
        ++n_ops;
        colflag[j] = 0;
        --ncol;
        updated = true;
    }

    void remove_dominated_column(int32_t j) {
        if (!colflag[j]) return;
        const double tol = 100 * std::sqrt(2.220446049250313e-16);

        double ls = 0.0, us = 0.0;
        for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
            int32_t i = ci[p];
            double aij = cv[p];
            if (!(rowflag[i] && aij != 0.0)) continue;
            ls += aij * ((aij >= 0) ? ly[i] : uy[i]);
            us += aij * ((aij >= 0) ? uy[i] : ly[i]);
        }

        double cj = obj[j];
        if (cj - us > tol) {
            double lb = lcol[j];
            if (!std::isfinite(lb)) {
                dual_infeasible_cert(j, -1.0);
                return;
            }
            fix_column_at(j, lb, cj);
        } else if (cj - ls < -tol) {
            double ub = ucol[j];
            if (!std::isfinite(ub)) {
                dual_infeasible_cert(j, 1.0);
                return;
            }
            fix_column_at(j, ub, cj);
        }
    }

    // ---- batch scans (presolve.py:491-570) ---------------------------
    void remove_empty_rows() {
        for (int32_t i = 0; i < m; ++i) {
            if (rowflag[i] && nzrow[i] == 0) {
                remove_empty_row(i);
                if (status != TRM_UNKNOWN) return;
            }
        }
    }

    void remove_empty_columns() {
        for (int32_t j = 0; j < n; ++j) {
            remove_empty_column(j);
            if (status != TRM_UNKNOWN) return;
        }
    }

    void remove_fixed_variables() {
        for (int32_t j = 0; j < n; ++j) {
            if (colflag[j]) {
                remove_fixed_variable(j);
                if (status != TRM_UNKNOWN) return;
            }
        }
    }

    void remove_row_singletons() {
        std::vector<int32_t> singletons;
        singletons.swap(row_singletons);
        for (int32_t i : singletons) {
            remove_row_singleton(i);
            if (status != TRM_UNKNOWN) return;
        }
    }

    void remove_forcing_rows() {
        for (int32_t i = 0; i < m; ++i) {
            if (rowflag[i]) {
                remove_forcing_row(i);
                if (status != TRM_UNKNOWN) return;
            }
        }
    }

    void remove_free_column_singletons() {
        for (int32_t j = 0; j < n; ++j) {
            remove_free_column_singleton(j);
            if (status != TRM_UNKNOWN) return;
        }
    }

    void remove_dominated_columns() {
        // Strengthen dual bounds from column singletons first
        // (presolve.py:532-554, reference: Presolve.jl:648-710).
        for (int32_t j = 0; j < n; ++j) {
            if (!(colflag[j] && nzcol[j] == 1)) continue;
            int32_t i = -1;
            double aij = 0.0;
            int32_t count = 0;
            for (int32_t p = cp[j]; p < cp[j + 1]; ++p) {
                if (rowflag[ci[p]] && cv[p] != 0.0) {
                    ++count;
                    if (count == 1) { i = ci[p]; aij = cv[p]; }
                }
            }
            if (count != 1) continue;
            double l = lcol[j], u = ucol[j];
            double y_ = obj[j] / aij;
            bool lf = std::isfinite(l), uf = std::isfinite(u);
            if (lf && !uf) {
                if (aij > 0) uy[i] = std::min(uy[i], y_);
                else ly[i] = std::max(ly[i], y_);
            } else if (!lf && uf) {
                if (aij > 0) ly[i] = std::max(ly[i], y_);
                else uy[i] = std::min(uy[i], y_);
            }
        }
        for (int32_t j = 0; j < n; ++j) {
            remove_dominated_column(j);
            if (status != TRM_UNKNOWN) return;
        }
    }

    void bounds_consistency_checks() {
        for (int32_t i = 0; i < m; ++i) {
            if (rowflag[i] && lrow[i] > urow[i]) {
                primal_infeasible_cert(i, -1, 1.0, 1.0, 0.0, 0.0);
                return;
            }
        }
        for (int32_t j = 0; j < n; ++j) {
            if (colflag[j] && lcol[j] > ucol[j]) {
                primal_infeasible_cert(-1, j, 0.0, 0.0, 1.0, 1.0);
                return;
            }
        }
    }

    // ---- driver (presolve.py:575-641, reference: Presolve.jl:374-463) -
    int32_t run() {
        bounds_consistency_checks();
        if (status == TRM_PRIMAL_INFEASIBLE) return status;

        remove_empty_rows();
        remove_empty_columns();
        if (status != TRM_UNKNOWN) return status;

        row_singletons.clear();
        for (int32_t i = 0; i < m; ++i)
            if (rowflag[i] && nzrow[i] == 1) row_singletons.push_back(i);

        updated = true;
        while (updated && status == TRM_UNKNOWN) {
            updated = false;

            bounds_consistency_checks();
            if (status != TRM_UNKNOWN) return status;
            remove_empty_columns();
            if (status != TRM_UNKNOWN) return status;

            remove_row_singletons();
            if (status != TRM_UNKNOWN) return status;
            remove_fixed_variables();
            if (status != TRM_UNKNOWN) return status;

            remove_row_singletons();
            if (status != TRM_UNKNOWN) return status;
            remove_forcing_rows();
            if (status != TRM_UNKNOWN) return status;

            remove_row_singletons();
            if (status != TRM_UNKNOWN) return status;
            remove_free_column_singletons();
            if (status != TRM_UNKNOWN) return status;

            remove_row_singletons();
            if (status != TRM_UNKNOWN) return status;
            remove_dominated_columns();
            if (status != TRM_UNKNOWN) return status;
        }

        remove_empty_columns();

        if (nrow == 0 && ncol == 0) status = TRM_OPTIMAL;
        return status;
    }
};

}  // namespace

extern "C" {

// Runs the full presolve. `sizes` out: [nrow_red, ncol_red, n_ops,
// oi_len, od_len]. Returns an opaque handle (never null on valid input;
// null only on allocation failure or inconsistent CSR/CSC).
void* tlp_presolve_run(int32_t m, int32_t n,
                       const int32_t* rp, const int32_t* rj, const double* rv,
                       const int32_t* cp, const int32_t* ci, const double* cv,
                       const double* lrow, const double* urow,
                       const double* lcol, const double* ucol,
                       const double* obj, double obj0,
                       double tol_pfeas, double tol_dfeas,
                       int32_t* out_status, int32_t* sizes) {
    if (m < 0 || n < 0 || rp[m] != cp[n]) return nullptr;
    Engine* e = new (std::nothrow) Engine();
    if (!e) return nullptr;
    e->m = m; e->n = n;
    e->rp.assign(rp, rp + m + 1);
    e->rj.assign(rj, rj + rp[m]);
    e->rv.assign(rv, rv + rp[m]);
    e->cp.assign(cp, cp + n + 1);
    e->ci.assign(ci, ci + cp[n]);
    e->cv.assign(cv, cv + cp[n]);
    e->rowflag.assign(m, 1);
    e->colflag.assign(n, 1);
    e->lrow.assign(lrow, lrow + m);
    e->urow.assign(urow, urow + m);
    e->lcol.assign(lcol, lcol + n);
    e->ucol.assign(ucol, ucol + n);
    e->obj.assign(obj, obj + n);
    e->obj0 = obj0;
    e->tol_pfeas = tol_pfeas;
    e->tol_dfeas = tol_dfeas;
    e->nrow = m;
    e->ncol = n;

    // Nonzero counts (presolve.py:60-67): count v != 0 column-wise.
    e->nzrow.assign(m, 0);
    e->nzcol.assign(n, 0);
    for (int32_t j = 0; j < n; ++j)
        for (int32_t p = cp[j]; p < cp[j + 1]; ++p)
            if (cv[p] != 0.0) { e->nzcol[j] += 1; e->nzrow[ci[p]] += 1; }

    // Dual bounds (presolve.py:83-87).
    e->ly.resize(m);
    e->uy.resize(m);
    for (int32_t i = 0; i < m; ++i) {
        e->ly[i] = (urow[i] == INF) ? 0.0 : -INF;
        e->uy[i] = (lrow[i] == -INF) ? 0.0 : INF;
    }

    *out_status = e->run();
    sizes[0] = e->nrow;
    sizes[1] = e->ncol;
    sizes[2] = e->n_ops;
    sizes[3] = static_cast<int32_t>(e->oi.size());
    sizes[4] = static_cast<int32_t>(e->od.size());
    return e;
}

// Copies results out. Buffer sizes must match tlp_presolve_run's `sizes`.
// cert_i: [kind, row, col]; cert_d: [yl, yu, sl, su, x]. Returns 0.
int32_t tlp_presolve_emit(void* handle,
                          uint8_t* rowflag, uint8_t* colflag,
                          double* lrow, double* urow,
                          double* lcol, double* ucol,
                          double* obj, double* obj0,
                          int32_t* oi, double* od,
                          int32_t* cert_i, double* cert_d) {
    Engine* e = static_cast<Engine*>(handle);
    for (int32_t i = 0; i < e->m; ++i) rowflag[i] = e->rowflag[i];
    for (int32_t j = 0; j < e->n; ++j) colflag[j] = e->colflag[j];
    for (int32_t i = 0; i < e->m; ++i) { lrow[i] = e->lrow[i]; urow[i] = e->urow[i]; }
    for (int32_t j = 0; j < e->n; ++j) {
        lcol[j] = e->lcol[j];
        ucol[j] = e->ucol[j];
        obj[j] = e->obj[j];
    }
    *obj0 = e->obj0;
    for (size_t k = 0; k < e->oi.size(); ++k) oi[k] = e->oi[k];
    for (size_t k = 0; k < e->od.size(); ++k) od[k] = e->od[k];
    cert_i[0] = e->cert_kind;
    cert_i[1] = e->cert_row;
    cert_i[2] = e->cert_col;
    cert_d[0] = e->cert_yl; cert_d[1] = e->cert_yu;
    cert_d[2] = e->cert_sl; cert_d[3] = e->cert_su;
    cert_d[4] = e->cert_x;
    return 0;
}

void tlp_presolve_free(void* handle) {
    delete static_cast<Engine*>(handle);
}

}  // extern "C"
