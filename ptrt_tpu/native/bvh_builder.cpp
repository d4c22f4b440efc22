// Native BVH builder for ptrt_tpu.
//
// C++ implementation of the median-split BVH build (the same heuristic as
// ptrt_tpu/geometry/bvh.py: split at the median of triangle centroids on the
// longest axis — the reference engine builds the same tree on CPU,
// mesh.cuh:403-492 / RTmesh.cuh:472-551).  Emits the flattened skip-pointer
// layout directly: DFS order, left child = i+1, skip = miss successor,
// leaves padded to a fixed block of LEAF_SIZE triangle slots.
//
// Exposed as a C ABI for ctypes; no Python.h dependency.
//
// Build: g++ -O3 -march=native -fPIC -shared bvh_builder.cpp -o libptrtnative.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildCtx {
    const float *tmin;  // (n,3)
    const float *tmax;  // (n,3)
    const float *cent;  // (n,3)
    int leaf_size;

    std::vector<float> bmin, bmax;
    std::vector<int32_t> leaf_first, skip;
    std::vector<int64_t> order;
    std::vector<int32_t> left_child, right_child;
};

struct Box {
    float mn[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float mx[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    void grow(const float *lo, const float *hi) {
        for (int a = 0; a < 3; ++a) {
            mn[a] = std::min(mn[a], lo[a]);
            mx[a] = std::max(mx[a], hi[a]);
        }
    }
    void grow(const Box &b) { grow(b.mn, b.mx); }
    float half_area() const {
        const float dx = std::max(0.0f, mx[0] - mn[0]);
        const float dy = std::max(0.0f, mx[1] - mn[1]);
        const float dz = std::max(0.0f, mx[2] - mn[2]);
        return dx * dy + dy * dz + dz * dx;
    }
};

constexpr int SAH_BINS = 16;

int build_node(BuildCtx &ctx, int64_t *idx, int64_t count) {
    const int node_id = static_cast<int>(ctx.leaf_first.size());
    Box nb;
    for (int64_t i = 0; i < count; ++i)
        nb.grow(ctx.tmin + idx[i] * 3, ctx.tmax + idx[i] * 3);
    ctx.bmin.insert(ctx.bmin.end(), nb.mn, nb.mn + 3);
    ctx.bmax.insert(ctx.bmax.end(), nb.mx, nb.mx + 3);
    ctx.leaf_first.push_back(-1);
    ctx.skip.push_back(-1);
    ctx.left_child.push_back(-1);
    ctx.right_child.push_back(-1);

    if (count <= ctx.leaf_size) {
        const int64_t first = static_cast<int64_t>(ctx.order.size());
        for (int64_t i = 0; i < count; ++i) ctx.order.push_back(idx[i]);
        for (int64_t i = count; i < ctx.leaf_size; ++i) ctx.order.push_back(-1);
        ctx.leaf_first[node_id] = static_cast<int32_t>(first);
        return node_id;
    }

    // centroid bounds
    float cmn[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float cmx[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t i = 0; i < count; ++i) {
        const float *c = ctx.cent + idx[i] * 3;
        for (int a = 0; a < 3; ++a) {
            cmn[a] = std::min(cmn[a], c[a]);
            cmx[a] = std::max(cmx[a], c[a]);
        }
    }

    // binned SAH over all three axes; fall back to median split when
    // degenerate.  SAH trees sharply reduce worst-case node visits, which
    // is what the lock-step vector traversal pays for.
    int best_axis = -1, best_bin = -1;
    float best_cost = 3.4e38f;
    float inv_ext[3];
    for (int a = 0; a < 3; ++a) {
        const float e = cmx[a] - cmn[a];
        inv_ext[a] = e > 1e-12f ? 1.0f / e : 0.0f;
    }
    for (int axis = 0; axis < 3; ++axis) {
        if (inv_ext[axis] == 0.0f) continue;
        Box bins[SAH_BINS];
        int64_t bcount[SAH_BINS] = {0};
        for (int64_t i = 0; i < count; ++i) {
            const float c = ctx.cent[idx[i] * 3 + axis];
            int b = static_cast<int>((c - cmn[axis]) * inv_ext[axis]
                                     * SAH_BINS);
            b = std::min(std::max(b, 0), SAH_BINS - 1);
            bins[b].grow(ctx.tmin + idx[i] * 3, ctx.tmax + idx[i] * 3);
            bcount[b]++;
        }
        Box right_acc[SAH_BINS];
        Box acc;
        int64_t rcount[SAH_BINS] = {0};
        int64_t rc = 0;
        for (int b = SAH_BINS - 1; b >= 1; --b) {
            acc.grow(bins[b]);
            rc += bcount[b];
            right_acc[b] = acc;
            rcount[b] = rc;
        }
        Box lbox;
        int64_t lc = 0;
        for (int b = 0; b < SAH_BINS - 1; ++b) {
            lbox.grow(bins[b]);
            lc += bcount[b];
            if (lc == 0 || rcount[b + 1] == 0) continue;
            const float cost = lbox.half_area() * lc
                               + right_acc[b + 1].half_area() * rcount[b + 1];
            if (cost < best_cost) {
                best_cost = cost;
                best_axis = axis;
                best_bin = b;
            }
        }
    }

    int64_t half = -1;
    if (best_axis >= 0) {
        const float split =
            cmn[best_axis]
            + (best_bin + 1) * (cmx[best_axis] - cmn[best_axis]) / SAH_BINS;
        int64_t *mid = std::partition(
            idx, idx + count, [&](int64_t t) {
                return ctx.cent[t * 3 + best_axis] < split;
            });
        half = mid - idx;
        if (half == 0 || half == count) half = -1;  // degenerate partition
    }
    if (half < 0) {
        // median fallback on longest centroid axis
        int axis = 0;
        float beste = cmx[0] - cmn[0];
        for (int a = 1; a < 3; ++a) {
            if (cmx[a] - cmn[a] > beste) {
                beste = cmx[a] - cmn[a];
                axis = a;
            }
        }
        half = count / 2;
        std::nth_element(idx, idx + half, idx + count,
                         [&](int64_t a, int64_t b) {
                             return ctx.cent[a * 3 + axis]
                                    < ctx.cent[b * 3 + axis];
                         });
    }

    const int lid = build_node(ctx, idx, half);
    const int rid = build_node(ctx, idx + half, count - half);
    ctx.left_child[node_id] = lid;
    ctx.right_child[node_id] = rid;
    return node_id;
}

void assign_skip(BuildCtx &ctx, int root, int after) {
    // iterative DFS; skip = next node after my subtree
    std::vector<std::pair<int, int>> stack;
    stack.emplace_back(root, after);
    while (!stack.empty()) {
        auto [nid, aft] = stack.back();
        stack.pop_back();
        ctx.skip[nid] = aft;
        const int lid = ctx.left_child[nid];
        if (lid >= 0) {
            const int rid = ctx.right_child[nid];
            stack.emplace_back(rid, aft);
            stack.emplace_back(lid, rid);
        }
    }
}

BuildCtx *g_last = nullptr;

}  // namespace

extern "C" {

// Builds the BVH. Returns number of nodes; call ptrt_bvh_fetch to copy out.
// order_len receives the padded triangle-slot count.
int64_t ptrt_bvh_build(const float *tmin, const float *tmax, const float *cent,
                       int64_t n, int32_t leaf_size, int64_t *order_len) {
    delete g_last;
    g_last = new BuildCtx();
    g_last->tmin = tmin;
    g_last->tmax = tmax;
    g_last->cent = cent;
    g_last->leaf_size = leaf_size;

    std::vector<int64_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    if (n > 0) {
        build_node(*g_last, idx.data(), n);
        assign_skip(*g_last, 0, static_cast<int>(g_last->leaf_first.size()));
    }
    *order_len = static_cast<int64_t>(g_last->order.size());
    return static_cast<int64_t>(g_last->leaf_first.size());
}

void ptrt_bvh_fetch(float *bmin, float *bmax, int32_t *leaf_first,
                    int32_t *skip, int64_t *order) {
    if (!g_last) return;
    std::memcpy(bmin, g_last->bmin.data(), g_last->bmin.size() * sizeof(float));
    std::memcpy(bmax, g_last->bmax.data(), g_last->bmax.size() * sizeof(float));
    std::memcpy(leaf_first, g_last->leaf_first.data(),
                g_last->leaf_first.size() * sizeof(int32_t));
    std::memcpy(skip, g_last->skip.data(),
                g_last->skip.size() * sizeof(int32_t));
    std::memcpy(order, g_last->order.data(),
                g_last->order.size() * sizeof(int64_t));
    delete g_last;
    g_last = nullptr;
}

}  // extern "C"
