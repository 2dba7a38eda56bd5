// Fast MPS tokenizer/parser (C ABI, consumed via ctypes).
//
// Plays the native "data-loader" role: the reference reads MPS through a
// pure-Julia reader (QPSReader, reference: src/Interfaces/tulip_julia_api.jl:23);
// here the byte scanning, tokenizing and number parsing — the hot part of
// ingesting multi-MB instances — run in C++, while bound/range SEMANTICS
// stay in Python (tulip_tpu/io/mps.py) so the two parsers share one
// behavioral definition. Output is flat arrays of raw section records.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Parser {
    const char* p;
    const char* end;

    // Outputs.
    std::string name;
    int objsense_min = 1;
    std::string row_types;             // one char per constraint row
    std::string row_names;             // '\0'-joined
    std::vector<std::string> col_name_list;
    std::string error;

    std::vector<int32_t> e_row, e_col;
    std::vector<double> e_val;
    std::vector<int32_t> obj_col;
    std::vector<double> obj_val;
    double obj_const = 0.0;
    std::vector<int32_t> rhs_row;
    std::vector<double> rhs_val;
    std::vector<int32_t> rng_row;
    std::vector<double> rng_val;
    std::string bnd_types;             // 2 chars per bound record
    std::vector<int32_t> bnd_col;
    std::vector<double> bnd_val;
    std::vector<uint8_t> bnd_has_val;  // bound record had a value token

    std::unordered_map<std::string, int32_t> row_idx;  // -1 = objective
    std::unordered_map<std::string, int32_t> col_idx;
    std::string obj_row;
    bool have_obj_row = false;

    explicit Parser(const char* text, int64_t len)
        : p(text), end(text + len) {}

    bool eof() const { return p >= end; }

    // Read one logical line's tokens; returns false at EOF. Skips blank
    // and comment lines. header=true if line starts at column 0 with a
    // non-space char.
    bool next_line(std::vector<std::string>& toks, bool& header) {
        while (!eof()) {
            const char* ls = p;
            const char* le = static_cast<const char*>(
                memchr(p, '\n', end - p));
            if (!le) le = end;
            p = (le == end) ? end : le + 1;
            // Trim trailing CR.
            while (le > ls && (le[-1] == '\r')) --le;
            // Skip blanks/comments.
            const char* q = ls;
            while (q < le && (*q == ' ' || *q == '\t')) ++q;
            if (q == le || *q == '*') continue;
            header = (q == ls);
            toks.clear();
            while (q < le) {
                while (q < le && (*q == ' ' || *q == '\t')) ++q;
                const char* ts = q;
                while (q < le && *q != ' ' && *q != '\t') ++q;
                if (q > ts) toks.emplace_back(ts, q - ts);
            }
            if (!toks.empty()) return true;
        }
        return false;
    }

    int32_t col_of(const std::string& nm) {
        auto it = col_idx.find(nm);
        if (it != col_idx.end()) return it->second;
        int32_t j = static_cast<int32_t>(col_name_list.size());
        col_idx.emplace(nm, j);
        col_name_list.push_back(nm);
        return j;
    }

    static double num(const std::string& s, bool* ok) {
        char* e = nullptr;
        double v = strtod(s.c_str(), &e);
        *ok = (e && *e == '\0');
        return v;
    }

    void run() {
        std::vector<std::string> toks;
        bool header = false;
        std::string section;
        bool pending = next_line(toks, header);
        while (pending && error.empty()) {
            if (header) {
                std::string head = toks[0];
                for (auto& c : head) c = toupper(c);
                if (head == "NAME") {
                    if (toks.size() > 1) name = toks[1];
                    section = "NAME";
                } else if (head == "ROWS" || head == "COLUMNS" ||
                           head == "RHS" || head == "RANGES" ||
                           head == "BOUNDS" || head == "OBJSENSE") {
                    section = head;
                } else if (head == "ENDATA") {
                    break;
                } else {
                    error = "Unknown MPS section: " + toks[0];
                    break;
                }
                pending = next_line(toks, header);
                continue;
            }

            if (section == "OBJSENSE") {
                std::string s0 = toks[0];
                for (auto& c : s0) c = toupper(c);
                objsense_min = (s0 == "MIN" || s0 == "MINIMIZE") ? 1 : 0;
            } else if (section == "ROWS") {
                if (toks.size() < 2) { error = "Malformed ROWS line"; break; }
                char rt = toupper(toks[0][0]);
                if (rt == 'N') {
                    if (!have_obj_row) {
                        obj_row = toks[1];
                        have_obj_row = true;
                        row_idx.emplace(toks[1], -1);
                    } else {
                        row_idx.emplace(toks[1], -1);  // extra N rows ignored
                    }
                } else if (rt == 'E' || rt == 'L' || rt == 'G') {
                    int32_t i = static_cast<int32_t>(row_types.size());
                    row_types.push_back(rt);
                    row_names += toks[1];
                    row_names.push_back('\0');
                    row_idx.emplace(toks[1], i);
                } else {
                    error = std::string("Unknown row type ") + toks[0];
                    break;
                }
            } else if (section == "COLUMNS") {
                // Marker lines toggle integrality (relaxed for LP).
                if (toks.size() >= 3) {
                    std::string t1 = toks[1];
                    // strip quotes
                    std::string t1s;
                    for (char c : t1)
                        if (c != '\'' && c != '"') t1s += toupper(c);
                    if (t1s == "MARKER") {
                        pending = next_line(toks, header);
                        continue;
                    }
                }
                if (toks.size() < 3 || (toks.size() % 2) == 0) {
                    error = "Malformed COLUMNS line";
                    break;
                }
                int32_t j = col_of(toks[0]);
                for (size_t k = 1; k + 1 < toks.size(); k += 2) {
                    auto it = row_idx.find(toks[k]);
                    if (it == row_idx.end()) {
                        error = "Unknown row " + toks[k] + " in COLUMNS";
                        break;
                    }
                    bool ok;
                    double v = num(toks[k + 1], &ok);
                    if (!ok) { error = "Bad number " + toks[k + 1]; break; }
                    if (it->second < 0) {
                        if (toks[k] == obj_row) {
                            obj_col.push_back(j);
                            obj_val.push_back(v);
                        }
                        // entries on other N rows: ignored
                    } else {
                        e_row.push_back(it->second);
                        e_col.push_back(j);
                        e_val.push_back(v);
                    }
                }
            } else if (section == "RHS" || section == "RANGES") {
                if (toks.size() < 3) { error = "Malformed " + section; break; }
                for (size_t k = 1; k + 1 < toks.size(); k += 2) {
                    auto it = row_idx.find(toks[k]);
                    if (it == row_idx.end()) {
                        error = "Unknown row " + toks[k] + " in " + section;
                        break;
                    }
                    bool ok;
                    double v = num(toks[k + 1], &ok);
                    if (!ok) { error = "Bad number " + toks[k + 1]; break; }
                    if (section == "RHS") {
                        if (it->second < 0) {
                            if (toks[k] == obj_row) obj_const = -v;
                        } else {
                            rhs_row.push_back(it->second);
                            rhs_val.push_back(v);
                        }
                    } else if (it->second >= 0) {
                        rng_row.push_back(it->second);
                        rng_val.push_back(v);
                    }
                }
            } else if (section == "BOUNDS") {
                if (toks.size() < 3) { error = "Malformed BOUNDS line"; break; }
                std::string bt = toks[0];
                for (auto& c : bt) c = toupper(c);
                if (bt.size() > 2) { error = "Unknown bound type " + toks[0]; break; }
                const std::string& cname = toks[2];
                int32_t j = col_of(cname);
                double v = 0.0;
                uint8_t has_v = 0;
                if (toks.size() >= 4) {
                    bool ok;
                    v = num(toks[3], &ok);
                    if (!ok) { error = "Bad number " + toks[3]; break; }
                    has_v = 1;
                }
                bnd_types.push_back(bt[0]);
                bnd_types.push_back(bt.size() > 1 ? bt[1] : ' ');
                bnd_col.push_back(j);
                bnd_val.push_back(v);
                bnd_has_val.push_back(has_v);
            }
            pending = next_line(toks, header);
        }
    }
};

template <typename T>
T* dup(const std::vector<T>& v) {
    T* out = static_cast<T*>(malloc(sizeof(T) * (v.size() + 1)));
    if (!v.empty()) memcpy(out, v.data(), sizeof(T) * v.size());
    return out;
}

char* dup_str(const std::string& s) {
    char* out = static_cast<char*>(malloc(s.size() + 1));
    memcpy(out, s.data(), s.size());
    out[s.size()] = '\0';
    return out;
}

}  // namespace

extern "C" {

struct MpsResult {
    int64_t n_rows;
    char* row_types;
    char* row_names;        // '\0'-joined, n_rows entries
    int64_t row_names_len;
    int64_t n_cols;
    char* col_names;        // '\0'-joined
    int64_t col_names_len;
    int64_t nnz;
    int32_t* e_row;
    int32_t* e_col;
    double* e_val;
    int64_t n_obj;
    int32_t* obj_col;
    double* obj_val;
    double obj_const;
    int32_t objsense_min;
    int64_t n_rhs;
    int32_t* rhs_row;
    double* rhs_val;
    int64_t n_rng;
    int32_t* rng_row;
    double* rng_val;
    int64_t n_bnd;
    char* bnd_types;        // 2 chars per record
    int32_t* bnd_col;
    double* bnd_val;
    uint8_t* bnd_has_val;
    char* name;
    char* error;            // nullptr on success
};

MpsResult* tulip_parse_mps(const char* text, int64_t len) {
    Parser ps(text, len);
    ps.run();

    auto* r = static_cast<MpsResult*>(calloc(1, sizeof(MpsResult)));
    if (!ps.error.empty()) {
        r->error = dup_str(ps.error);
        return r;
    }
    r->n_rows = static_cast<int64_t>(ps.row_types.size());
    r->row_types = dup_str(ps.row_types);
    r->row_names = dup_str(ps.row_names);
    r->row_names_len = static_cast<int64_t>(ps.row_names.size());

    std::string col_blob;
    for (auto& nm : ps.col_name_list) {
        col_blob += nm;
        col_blob.push_back('\0');
    }
    r->n_cols = static_cast<int64_t>(ps.col_name_list.size());
    r->col_names = dup_str(col_blob);
    r->col_names_len = static_cast<int64_t>(col_blob.size());

    r->nnz = static_cast<int64_t>(ps.e_val.size());
    r->e_row = dup(ps.e_row);
    r->e_col = dup(ps.e_col);
    r->e_val = dup(ps.e_val);
    r->n_obj = static_cast<int64_t>(ps.obj_val.size());
    r->obj_col = dup(ps.obj_col);
    r->obj_val = dup(ps.obj_val);
    r->obj_const = ps.obj_const;
    r->objsense_min = ps.objsense_min;
    r->n_rhs = static_cast<int64_t>(ps.rhs_val.size());
    r->rhs_row = dup(ps.rhs_row);
    r->rhs_val = dup(ps.rhs_val);
    r->n_rng = static_cast<int64_t>(ps.rng_val.size());
    r->rng_row = dup(ps.rng_row);
    r->rng_val = dup(ps.rng_val);
    r->n_bnd = static_cast<int64_t>(ps.bnd_col.size());
    r->bnd_types = dup_str(ps.bnd_types);
    r->bnd_col = dup(ps.bnd_col);
    r->bnd_val = dup(ps.bnd_val);
    r->bnd_has_val = dup(ps.bnd_has_val);
    r->name = dup_str(ps.name);
    r->error = nullptr;
    return r;
}

void tulip_free_mps(MpsResult* r) {
    if (!r) return;
    free(r->row_types);
    free(r->row_names);
    free(r->col_names);
    free(r->e_row);
    free(r->e_col);
    free(r->e_val);
    free(r->obj_col);
    free(r->obj_val);
    free(r->rhs_row);
    free(r->rhs_val);
    free(r->rng_row);
    free(r->rng_val);
    free(r->bnd_types);
    free(r->bnd_col);
    free(r->bnd_val);
    free(r->bnd_has_val);
    free(r->name);
    free(r->error);
    free(r);
}

}  // extern "C"
