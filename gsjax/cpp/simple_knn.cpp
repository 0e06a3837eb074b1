// Native KNN for gaussian initial scales.
//
// C++ equivalent of the reference's `simple-knn` CUDA submodule
// (simple_knn.cu:45-221 / spatial.cu:15-26): mean squared distance to the k
// nearest neighbours of every point. Implemented as an in-place KD-tree with
// best-first search, OpenMP-parallel over query points; exposed via a C ABI
// for the ctypes binding in gsjax/ops/knn.py.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC simple_knn.cpp -o libsimple_knn.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct KDTree {
    // flat binary tree over an index permutation; leaves hold <= LEAF points
    static constexpr int LEAF = 16;
    const float* pts;  // [n,3]
    std::vector<int> idx;
    struct Node {
        float split;
        int axis;        // -1 for leaf
        int begin, end;  // range in idx (leaf) or child base (internal)
        int left, right;
    };
    std::vector<Node> nodes;

    int build(int begin, int end, std::vector<float>& lo, std::vector<float>& hi) {
        int id = (int)nodes.size();
        nodes.push_back({});
        if (end - begin <= LEAF) {
            nodes[id] = {0.f, -1, begin, end, -1, -1};
            return id;
        }
        // split on widest axis of the bounding box of this range
        float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
        for (int i = begin; i < end; i++) {
            const float* p = pts + 3 * idx[i];
            for (int d = 0; d < 3; d++) {
                mn[d] = std::min(mn[d], p[d]);
                mx[d] = std::max(mx[d], p[d]);
            }
        }
        int axis = 0;
        for (int d = 1; d < 3; d++)
            if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;
        int mid = (begin + end) / 2;
        std::nth_element(idx.begin() + begin, idx.begin() + mid, idx.begin() + end,
                         [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
        float split = pts[3 * idx[mid] + axis];
        int l = build(begin, mid, lo, hi);
        int r = build(mid, end, lo, hi);
        nodes[id] = {split, axis, begin, end, l, r};
        return id;
    }

    void init(const float* p, int n) {
        pts = p;
        idx.resize(n);
        for (int i = 0; i < n; i++) idx[i] = i;
        nodes.reserve(2 * n / LEAF + 8);
        std::vector<float> lo, hi;
        build(0, n, lo, hi);
    }

    // k-NN excluding the query index itself; best[] is a max-heap of size k.
    void query(int node_id, const float* q, int self, int k, float* best) const {
        const Node& nd = nodes[node_id];
        if (nd.axis < 0) {
            for (int i = nd.begin; i < nd.end; i++) {
                int j = idx[i];
                if (j == self) continue;
                const float* p = pts + 3 * j;
                float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < best[0]) {
                    std::pop_heap(best, best + k);
                    best[k - 1] = d2;
                    std::push_heap(best, best + k);
                }
            }
            return;
        }
        float diff = q[nd.axis] - nd.split;
        int near = diff < 0 ? nd.left : nd.right;
        int far = diff < 0 ? nd.right : nd.left;
        query(near, q, self, k, best);
        if (diff * diff < best[0]) query(far, q, self, k, best);
    }
};

}  // namespace

extern "C" {

// out[i] = mean over the k nearest neighbours of squared distance.
void mean_knn_dist2(const float* points, int64_t n, int k, float* out) {
    if (n <= 1) {
        for (int64_t i = 0; i < n; i++) out[i] = 0.f;
        return;
    }
    KDTree tree;
    tree.init(points, (int)n);
    int kk = std::min<int64_t>(k, n - 1);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        float best[16];
        for (int j = 0; j < kk; j++) best[j] = 1e30f;
        std::make_heap(best, best + kk);
        tree.query(0, points + 3 * i, (int)i, kk, best);
        float s = 0.f;
        for (int j = 0; j < kk; j++) s += best[j];
        out[i] = s / kk;
    }
}
}
