// Sparse QR via George-Heath row-rotation (Givens) elimination.
//
// Native (C++) replacement for the reference's SuiteSparseQR path
// (/root/reference/src/xerus/cholmod_wrapper.cpp:178-266, used by
// tensor.cpp:1495-1570 for sparse qr/qc/cq).  SPQR itself is a multifrontal
// Householder code; the semantics we need from it are (a) a thin factorization
// A = Q C with Q^T Q = I, (b) sparse inputs AND outputs, (c) Heath-style rank
// detection (small diagonal entries of R treated as dead columns — SPQR's
// rank detection is the same heuristic class, not a pivoted RRQR).  The
// row-merging Givens scheme (George & Heath 1980) delivers exactly that with
// no external dependencies:
//
//   maintain up to n stored rows R_j (leading column j) with companion
//   orthonormal vectors v_j in R^m such that  R_j = v_j^T A ; for each input
//   row a_i (companion e_i), while a_i is nonempty either install it at its
//   leading column's empty slot or Givens-rotate it against the stored row,
//   which zeroes its leading entry exactly.  Givens rotations preserve the
//   orthonormality of the whole companion set, so Q = [v_j columns] is
//   orthonormal by construction and A = Q R exactly (up to roundoff).
//
// Rank rule: slot j is dead if |R_jj| < rel_tol * max_j |R_jj| (matching the
// dense QC rule blasLapackWrapper.cpp:268-273 with rel_tol = 16*eps); pass
// rel_tol = 0 for structural-rank-only elimination (sparse plain QR).
//
// C ABI for ctypes (no pybind11 in this image).  Build: make -C native.

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

struct Entry {
    int64_t idx;
    double val;
};

using SpVec = std::vector<Entry>;  // sorted by idx, no explicit zeros

// rotated = c*x + s*y ; counterpart = -s*x + c*y, computed in one merge pass.
void givens_merge(const SpVec& x, const SpVec& y, double c, double s,
                  SpVec& out_rot, SpVec& out_counter) {
    out_rot.clear();
    out_counter.clear();
    size_t i = 0, j = 0;
    while (i < x.size() || j < y.size()) {
        int64_t ix = i < x.size() ? x[i].idx : INT64_MAX;
        int64_t iy = j < y.size() ? y[j].idx : INT64_MAX;
        int64_t idx;
        double xv = 0.0, yv = 0.0;
        if (ix <= iy) { idx = ix; xv = x[i++].val; }
        else idx = iy;
        if (iy == idx && j < y.size()) yv = y[j++].val;
        double r = c * xv + s * yv;
        double q = c * yv - s * xv;
        if (r != 0.0) out_rot.push_back({idx, r});
        if (q != 0.0) out_counter.push_back({idx, q});
    }
}

struct Factorization {
    int64_t m = 0, n = 0, rank = 0;
    std::vector<int64_t> kept;   // kept slot (column) indices, ascending
    std::vector<SpVec> R;        // per slot: sparse row (leading col = slot)
    std::vector<SpVec> V;        // per slot: Q column (length-m sparse vector)
    std::vector<int64_t> order;  // order[slot] = original column id
    int64_t q_nnz = 0, r_nnz = 0;
};

// Fill-reducing column preorderings (the role of SPQR's COLAMD stage,
// cholmod_wrapper.h:44-100).  The Givens elimination's fill is driven by
// how early wide columns become pivots; eliminating thin columns first is
// George & Heath's own recommendation.
//   ordering 0: natural (input order)
//   ordering 1: ascending column count (colperm / static minimum degree)
//   ordering 2: greedy minimum degree on the column-intersection graph of
//               A^T A (approximate: degrees updated through a quotient of
//               merged row cliques, COLAMD's class without supervariables)
std::vector<int64_t> column_order(int64_t ordering, int64_t m, int64_t n,
                                  const std::vector<SpVec>& arows) {
    std::vector<int64_t> order(static_cast<size_t>(n));
    for (int64_t j = 0; j < n; ++j) order[static_cast<size_t>(j)] = j;
    if (ordering == 1) {
        std::vector<int64_t> count(static_cast<size_t>(n), 0);
        for (const SpVec& row : arows)
            for (const Entry& e : row) ++count[static_cast<size_t>(e.idx)];
        std::stable_sort(order.begin(), order.end(),
                         [&](int64_t a, int64_t b) {
                             return count[static_cast<size_t>(a)]
                                  < count[static_cast<size_t>(b)];
                         });
    } else if (ordering == 2) {
        // Row cliques: every row couples all its columns in A^T A.  Greedy
        // min-degree: repeatedly pick the column of least degree (number of
        // distinct columns sharing a clique), then merge its cliques into
        // one element clique (quotient-graph step, Amestoy/Davis/Duff
        // class).  Degrees are recomputed lazily per pick from the live
        // cliques of the candidate — exact on the quotient, no
        // supervariable detection (fine at the n <= few-thousand scale the
        // dispatch routes here).
        std::vector<std::vector<int64_t>> cliques;   // live element lists
        cliques.reserve(arows.size());
        std::vector<std::vector<int64_t>> memb(static_cast<size_t>(n));
        for (const SpVec& row : arows) {
            if (row.size() < 2) continue;   // no intersection-graph edges
            int64_t id = static_cast<int64_t>(cliques.size());
            cliques.push_back({});
            for (const Entry& e : row) {
                cliques.back().push_back(e.idx);
                memb[static_cast<size_t>(e.idx)].push_back(id);
            }
        }
        std::vector<char> eliminated(static_cast<size_t>(n), 0);
        std::vector<char> live(cliques.size(), 1);
        std::vector<int64_t> mark(static_cast<size_t>(n), -1);
        std::vector<int64_t> result;
        result.reserve(static_cast<size_t>(n));
        // simple bucketed selection by (approximate) degree, lazily revalidated
        for (int64_t pick = 0; pick < n; ++pick) {
            int64_t best = -1, best_deg = INT64_MAX;
            for (int64_t j = 0; j < n; ++j) {
                if (eliminated[static_cast<size_t>(j)]) continue;
                int64_t deg = 0;
                for (int64_t cid : memb[static_cast<size_t>(j)]) {
                    if (!live[static_cast<size_t>(cid)]) continue;
                    for (int64_t col : cliques[static_cast<size_t>(cid)]) {
                        if (col == j || eliminated[static_cast<size_t>(col)])
                            continue;
                        if (mark[static_cast<size_t>(col)] != pick) {
                            mark[static_cast<size_t>(col)] = pick;
                            ++deg;
                        }
                    }
                }
                if (deg < best_deg) { best_deg = deg; best = j; }
                if (best_deg == 0) break;
            }
            if (best < 0) break;
            eliminated[static_cast<size_t>(best)] = 1;
            // merge best's live cliques into one element over its neighbours
            std::vector<int64_t> merged;
            for (int64_t cid : memb[static_cast<size_t>(best)]) {
                if (!live[static_cast<size_t>(cid)]) continue;
                live[static_cast<size_t>(cid)] = 0;
                for (int64_t col : cliques[static_cast<size_t>(cid)])
                    if (col != best && !eliminated[static_cast<size_t>(col)]
                        && mark[static_cast<size_t>(col)] != n + pick) {
                        mark[static_cast<size_t>(col)] = n + pick;
                        merged.push_back(col);
                    }
            }
            if (!merged.empty()) {
                int64_t id = static_cast<int64_t>(cliques.size());
                cliques.push_back(merged);
                live.push_back(1);
                for (int64_t col : cliques.back())
                    memb[static_cast<size_t>(col)].push_back(id);
            }
            result.push_back(best);
        }
        for (int64_t j = 0; j < n; ++j)        // unseen (empty) columns last
            if (!eliminated[static_cast<size_t>(j)]) result.push_back(j);
        order = result;
    }
    return order;
}

}  // namespace

extern "C" {

// Factor an m x n COO matrix (duplicate coordinates are summed).  Returns an
// opaque handle, or nullptr when m, n or nnz is non-positive.  ``ordering``
// selects the fill-reducing column preorder (0 natural, 1 colcount,
// 2 greedy min-degree); R rows report ORIGINAL column ids regardless.
void* sqr_factor_ord(int64_t m, int64_t n, int64_t nnz,
                     const int64_t* rows, const int64_t* cols,
                     const double* vals, double rel_tol, int64_t ordering) {
    if (m <= 0 || n <= 0 || nnz < 0) return nullptr;
    // bucket entries per row, then sort each row by column and sum dups
    std::vector<SpVec> arows(static_cast<size_t>(m));
    for (int64_t k = 0; k < nnz; ++k) {
        if (rows[k] < 0 || rows[k] >= m || cols[k] < 0 || cols[k] >= n)
            return nullptr;
        arows[static_cast<size_t>(rows[k])].push_back({cols[k], vals[k]});
    }
    auto* F = new Factorization;
    F->m = m;
    F->n = n;
    F->order = column_order(ordering, m, n, arows);
    std::vector<int64_t> pos_of(static_cast<size_t>(n));
    for (int64_t k = 0; k < n; ++k)
        pos_of[static_cast<size_t>(F->order[static_cast<size_t>(k)])] = k;
    if (ordering != 0)          // relabel columns into elimination order
        for (SpVec& row : arows)
            for (Entry& e : row)
                e.idx = pos_of[static_cast<size_t>(e.idx)];
    F->R.assign(static_cast<size_t>(n), {});
    F->V.assign(static_cast<size_t>(n), {});

    SpVec a, v, tmp_rot, tmp_counter, tmp_rot2, tmp_counter2;
    for (int64_t i = 0; i < m; ++i) {
        a.swap(arows[static_cast<size_t>(i)]);
        std::sort(a.begin(), a.end(),
                  [](const Entry& x, const Entry& y) { return x.idx < y.idx; });
        // coalesce duplicates
        SpVec packed;
        for (const Entry& e : a) {
            if (!packed.empty() && packed.back().idx == e.idx)
                packed.back().val += e.val;
            else
                packed.push_back(e);
        }
        packed.erase(std::remove_if(packed.begin(), packed.end(),
                                    [](const Entry& e) { return e.val == 0.0; }),
                     packed.end());
        a.swap(packed);
        v.assign(1, {i, 1.0});

        while (!a.empty()) {
            size_t j = static_cast<size_t>(a.front().idx);
            if (F->R[j].empty()) {
                F->R[j].swap(a);
                F->V[j].swap(v);
                break;
            }
            double r0 = F->R[j].front().val;
            double a0 = a.front().val;
            double den = std::hypot(r0, a0);
            double c = r0 / den, s = a0 / den;
            givens_merge(F->R[j], a, c, s, tmp_rot, tmp_counter);
            givens_merge(F->V[j], v, c, s, tmp_rot2, tmp_counter2);
            F->R[j].swap(tmp_rot);
            F->V[j].swap(tmp_rot2);
            a.swap(tmp_counter);
            v.swap(tmp_counter2);
            // the eliminated leading entry is zero by construction; drop it
            // if roundoff left it (den-scaled cancellation keeps it exact,
            // but guard anyway)
            if (!a.empty() && static_cast<size_t>(a.front().idx) == j)
                a.erase(a.begin());
        }
    }

    // Heath dead-column handling: a stored row whose leading (diagonal)
    // entry is below the tolerance marks a dead COLUMN, but its tail may
    // carry O(1) mass — dropping the whole row would lose it (error
    // unbounded relative to the tolerance).  Instead, zero the tiny
    // leading entry (error <= cut per drop, the documented truncation
    // contract) and RE-ELIMINATE the row remainder with its companion
    // vector; cascades until no dead pivot remains (each pass strictly
    // empties one slot, so it terminates in <= n passes).
    if (rel_tol > 0.0) {
        for (;;) {
            double max_diag = 0.0;
            for (int64_t j = 0; j < n; ++j) {
                const SpVec& rj = F->R[static_cast<size_t>(j)];
                if (!rj.empty())
                    max_diag = std::max(max_diag, std::fabs(rj.front().val));
            }
            double cut = rel_tol * max_diag;
            int64_t dead = -1;
            for (int64_t j = 0; j < n; ++j) {
                const SpVec& rj = F->R[static_cast<size_t>(j)];
                if (!rj.empty() && std::fabs(rj.front().val) < cut) {
                    dead = j;
                    break;
                }
            }
            if (dead < 0) break;
            SpVec row;
            row.swap(F->R[static_cast<size_t>(dead)]);
            SpVec vv;
            vv.swap(F->V[static_cast<size_t>(dead)]);
            row.erase(row.begin());          // drop the tiny pivot entry
            while (!row.empty()) {
                size_t j = static_cast<size_t>(row.front().idx);
                if (F->R[j].empty()) {
                    F->R[j].swap(row);
                    F->V[j].swap(vv);
                    break;
                }
                double r0 = F->R[j].front().val;
                double a0 = row.front().val;
                double den = std::hypot(r0, a0);
                double c = r0 / den, s = a0 / den;
                givens_merge(F->R[j], row, c, s, tmp_rot, tmp_counter);
                givens_merge(F->V[j], vv, c, s, tmp_rot2, tmp_counter2);
                F->R[j].swap(tmp_rot);
                F->V[j].swap(tmp_rot2);
                row.swap(tmp_counter);
                vv.swap(tmp_counter2);
                if (!row.empty() && static_cast<size_t>(row.front().idx) == j)
                    row.erase(row.begin());
            }
        }
    }
    for (int64_t j = 0; j < n; ++j) {
        const SpVec& rj = F->R[static_cast<size_t>(j)];
        if (rj.empty()) continue;
        F->kept.push_back(j);
        F->r_nnz += static_cast<int64_t>(rj.size());
        F->q_nnz += static_cast<int64_t>(F->V[static_cast<size_t>(j)].size());
    }
    F->rank = static_cast<int64_t>(F->kept.size());
    return F;
}

// Back-compat entry: natural ordering.
void* sqr_factor(int64_t m, int64_t n, int64_t nnz,
                 const int64_t* rows, const int64_t* cols,
                 const double* vals, double rel_tol) {
    return sqr_factor_ord(m, n, nnz, rows, cols, vals, rel_tol, 0);
}

int64_t sqr_rank(void* h) { return static_cast<Factorization*>(h)->rank; }
int64_t sqr_q_nnz(void* h) { return static_cast<Factorization*>(h)->q_nnz; }
int64_t sqr_r_nnz(void* h) { return static_cast<Factorization*>(h)->r_nnz; }

// Original column id of each kept slot's pivot (length = rank).  Under a
// fill-reducing ordering R is triangular in ELIMINATION order, so solvers
// must identify pivots through this map rather than assuming the smallest
// original column id in each row.
void sqr_get_pivots(void* h, int64_t* pivots) {
    auto* F = static_cast<Factorization*>(h);
    for (int64_t k = 0; k < F->rank; ++k)
        pivots[k] = F->order[static_cast<size_t>(F->kept[k])];
}

// Q is m x rank: column k is the companion vector of the k-th kept slot.
void sqr_get_q(void* h, int64_t* rows, int64_t* cols, double* vals) {
    auto* F = static_cast<Factorization*>(h);
    int64_t p = 0;
    for (int64_t k = 0; k < F->rank; ++k) {
        for (const Entry& e : F->V[static_cast<size_t>(F->kept[k])]) {
            rows[p] = e.idx;
            cols[p] = k;
            vals[p] = e.val;
            ++p;
        }
    }
}

// R is rank x n: row k is the k-th kept stored row, reported with ORIGINAL
// column ids (entries are stored in elimination order internally).
void sqr_get_r(void* h, int64_t* rows, int64_t* cols, double* vals) {
    auto* F = static_cast<Factorization*>(h);
    int64_t p = 0;
    for (int64_t k = 0; k < F->rank; ++k) {
        for (const Entry& e : F->R[static_cast<size_t>(F->kept[k])]) {
            rows[p] = k;
            cols[p] = F->order[static_cast<size_t>(e.idx)];
            vals[p] = e.val;
            ++p;
        }
    }
}

void sqr_free(void* h) { delete static_cast<Factorization*>(h); }

}  // extern "C"
