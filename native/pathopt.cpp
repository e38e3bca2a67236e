// Contraction-order search: greedy scorer portfolio + exchange refinement.
//
// Native (C++) replacement for the reference's host-side search
// (/root/reference/src/xerus/contractionHeuristic.cpp:36-381): the scorers
// mirror score_size/mn/speed/r/big_tensor/littlestep and the exchange
// refinement perturbs the best greedy order by forcing alternative first
// contractions.  Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libpathopt.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>
#include <unordered_map>
#include <algorithm>

namespace {

struct Graph {
    int n;
    std::vector<double> sizes;                       // node size (alive: >0)
    std::vector<std::unordered_map<int, double>> shared;  // shared-dim products

    Graph(int n_nodes, const double* node_sizes, int n_edges,
          const int32_t* ea, const int32_t* eb, const double* edim)
        : n(n_nodes), sizes(node_sizes, node_sizes + n_nodes), shared(n_nodes) {
        for (int e = 0; e < n_edges; ++e) {
            int a = ea[e], b = eb[e];
            double d = edim[e];
            shared[a][b] = (shared[a].count(b) ? shared[a][b] : 1.0) * d;
            shared[b][a] = shared[a][b];
        }
    }

    void mnr(int a, int b, double& m, double& nn, double& r) const {
        auto it = shared[a].find(b);
        r = (it == shared[a].end()) ? 1.0 : it->second;
        m = sizes[a] / r;
        nn = sizes[b] / r;
    }

    double merge(int a, int b) {
        double m, nn, r;
        mnr(a, b, m, nn, r);
        double cost = m * nn * r;
        sizes[a] = m * nn;
        sizes[b] = -1.0;
        shared[a].erase(b);
        for (auto& kv : shared[b]) {
            int other = kv.first;
            if (other == a) continue;
            double cur = shared[a].count(other) ? shared[a][other] : 1.0;
            shared[a][other] = cur * kv.second;
            shared[other].erase(b);
            shared[other][a] = shared[a][other];
        }
        shared[b].clear();
        return cost;
    }
};

typedef double (*Scorer)(double, double, double);

double score_size(double m, double n, double r) { return n * m - (n + m) * r; }
double score_mn(double m, double n, double) { return m * n; }
double score_speed(double m, double n, double r) {
    return (n * m - (n + m) * r) / (n * m * r);
}
double score_r(double, double, double r) { return -r; }
double score_big_tensor(double m, double n, double r) {
    if (n * m < (n + m) * r) return -1e10 + n * m * r;
    return n * m - (n + m) * r;
}
double score_littlestep(double m, double n, double r) {
    if (n * m < (n + m) * r) return -std::max(n, m) * r;
    return n * m - (n + m) * r;
}

const Scorer kScorers[] = {score_size, score_mn, score_speed, score_r,
                           score_big_tensor, score_littlestep};

// One greedy run; `forced` optionally fixes the first contraction.
double greedy(Graph g, Scorer scorer, std::vector<std::pair<int, int>>& order,
              int forced_a = -1, int forced_b = -1) {
    order.clear();
    double total = 0.0;
    int alive = 0;
    for (int i = 0; i < g.n; ++i) if (g.sizes[i] > 0) ++alive;

    if (forced_a >= 0) {
        total += g.merge(forced_a, forced_b);
        order.emplace_back(forced_a, forced_b);
        --alive;
    }
    while (alive > 1) {
        double best_score = std::numeric_limits<double>::infinity();
        int ba = -1, bb = -1;
        for (int a = 0; a < g.n; ++a) {
            if (g.sizes[a] <= 0) continue;
            for (auto& kv : g.shared[a]) {
                int b = kv.first;
                if (b <= a || g.sizes[b] <= 0) continue;
                double m, nn, r;
                g.mnr(a, b, m, nn, r);
                double s = scorer(m, nn, r);
                if (s < best_score) { best_score = s; ba = a; bb = b; }
            }
        }
        if (ba < 0) {  // disconnected: outer-product smallest pair
            int s1 = -1, s2 = -1;
            for (int i = 0; i < g.n; ++i) {
                if (g.sizes[i] <= 0) continue;
                if (s1 < 0 || g.sizes[i] < g.sizes[s1]) { s2 = s1; s1 = i; }
                else if (s2 < 0 || g.sizes[i] < g.sizes[s2]) { s2 = i; }
            }
            ba = std::min(s1, s2); bb = std::max(s1, s2);
        }
        total += g.merge(ba, bb);
        order.emplace_back(ba, bb);
        --alive;
    }
    return total;
}

// Union-find over node ids (a merge(a, b) keeps id `a` alive).
struct DSU {
    std::vector<int> p;
    explicit DSU(int n) : p(n) { for (int i = 0; i < n; ++i) p[i] = i; }
    int find(int x) { while (p[x] != x) x = p[x] = p[p[x]]; return x; }
};

// One sequence-refinement pass (the reference's exchange heuristic,
// contractionHeuristic.cpp:278-370, re-derived for this Graph): walk the
// best order keeping a list of not-yet-applied "open" contractions; when a
// step consumes an open pair's result, re-associate the triple by applying
// whichever of its three pairings contracts cheapest NOW, carrying the
// (result, remaining) pair forward.  Returns the refined cost.
double refine_pass(const Graph& base,
                   const std::vector<std::pair<int, int>>& seq,
                   std::vector<std::pair<int, int>>& out) {
    Graph g = base;
    DSU dsu(base.n);
    out.clear();
    double total = 0.0;
    std::vector<std::pair<int, int>> open;

    auto apply = [&](int u, int v) {
        total += g.merge(u, v);
        dsu.p[v] = u;
        out.emplace_back(u, v);
    };
    auto pair_cost = [&](int u, int v) {
        double m, nn, r;
        g.mnr(u, v, m, nn, r);
        return m * nn * r;
    };

    for (const auto& step : seq) {
        int x = dsu.find(step.first);
        int y = dsu.find(step.second);
        bool consumed = false;
        std::vector<std::pair<int, int>> keep;
        for (auto& pr : open) {
            int a = dsu.find(pr.first), b = dsu.find(pr.second);
            if (consumed || (x != a && x != b && y != a && y != b)) {
                keep.emplace_back(a, b);
                continue;
            }
            int third = (x == a || x == b) ? y : x;
            // best of three pairings of {a, b, third}
            double cab = pair_cost(a, b);
            double cat = pair_cost(a, third);
            double cbt = pair_cost(b, third);
            int u, v, rem;
            if (cab <= cat && cab <= cbt)      { u = a; v = b; rem = third; }
            else if (cat <= cbt)               { u = a; v = third; rem = b; }
            else                               { u = b; v = third; rem = a; }
            apply(u, v);
            x = u; y = rem;   // carried open pair: (result, remaining)
            consumed = true;
        }
        open = std::move(keep);
        open.emplace_back(x, y);
    }
    for (auto& pr : open) {
        int a = dsu.find(pr.first), b = dsu.find(pr.second);
        if (a != b && g.sizes[a] > 0 && g.sizes[b] > 0) apply(a, b);
    }
    return total;
}

}  // namespace

extern "C" {

// Returns best cost; writes 2*(num_contractions) ints into out_pairs.
// out_pairs must hold 2*(n_alive-1) entries.
double pathopt_best_order(int n_nodes, const double* node_sizes, int n_edges,
                          const int32_t* ea, const int32_t* eb,
                          const double* edim, int32_t* out_pairs,
                          int32_t* out_len) {
    Graph base(n_nodes, node_sizes, n_edges, ea, eb, edim);

    double best_cost = std::numeric_limits<double>::infinity();
    std::vector<std::pair<int, int>> best_order, order;

    for (Scorer s : kScorers) {
        double c = greedy(base, s, order);
        if (c < best_cost) { best_cost = c; best_order = order; }
    }

    // Exchange refinement (contractionHeuristic.cpp:~250-370, simplified):
    // force each edge as the FIRST contraction, then greedy with the best
    // scorer; keep improvements.  Bounded to keep the search O(E * V^2).
    int tried = 0;
    for (int a = 0; a < n_nodes && tried < 64; ++a) {
        for (auto& kv : base.shared[a]) {
            int b = kv.first;
            if (b <= a) continue;
            if (++tried > 64) break;
            for (Scorer s : kScorers) {
                double c = greedy(base, s, order, a, b);
                if (c < best_cost) { best_cost = c; best_order = order; }
            }
        }
    }

    // Sequence refinement: re-associate triples along the best order while
    // it improves (the reference recurses under the same condition).
    std::vector<std::pair<int, int>> refined;
    for (int pass = 0; pass < 8; ++pass) {
        double c = refine_pass(base, best_order, refined);
        if (c + 1e-12 >= best_cost) break;
        best_cost = c;
        best_order = refined;
    }

    *out_len = static_cast<int32_t>(best_order.size());
    for (size_t i = 0; i < best_order.size(); ++i) {
        out_pairs[2 * i] = best_order[i].first;
        out_pairs[2 * i + 1] = best_order[i].second;
    }
    return best_cost;
}

}  // extern "C"
