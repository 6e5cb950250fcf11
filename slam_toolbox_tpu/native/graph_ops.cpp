// Native graph query kernels for the pose graph.
//
// The reference keeps its whole graph substrate in C++ (MapperGraph +
// BreadthFirstTraversal, Mapper.cpp:1215-1305; nanoflann KD queries,
// Mapper.cpp:1837-1912). Here the compute path is JAX, but the per-scan
// graph traversals are host-side and O(V) in Python — this library hosts
// them natively: distance-bounded BFS over CSR adjacency and the
// loop-closure candidate sweep (FindPossibleLoopClosure,
// Mapper.cpp:1960-2010).
//
// Build: g++ -O3 -shared -fPIC graph_ops.cpp -o libgraph_ops.so
// Bound via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Distance-bounded BFS (BreadthFirstTraversal + NearScanVisitor,
// Mapper.cpp:1244-1348): explore from `start`, include nodes whose
// reference position is within sqrt(max_sq) of (cx, cy); expansion only
// continues through included nodes. Marks visited_out[i]=1 for included
// nodes and returns their count (order: BFS discovery order written to
// order_out if non-null).
int64_t bfs_within_radius(
    int64_t n,
    const double* xy,            // (n, 2) reference positions
    const uint8_t* present,      // (n,) 0 = removed (tombstone)
    const int64_t* indptr,       // CSR row offsets (n + 1)
    const int64_t* indices,      // CSR column indices
    int64_t start,
    double cx, double cy, double max_sq,
    uint8_t* visited_out,        // (n,) zeroed by caller
    int64_t* order_out           // (n,) optional
) {
    if (start < 0 || start >= n || !present[start]) return 0;
    std::vector<uint8_t> seen(static_cast<size_t>(n), 0);
    std::queue<int64_t> q;
    q.push(start);
    seen[start] = 1;
    int64_t count = 0;
    while (!q.empty()) {
        int64_t v = q.front();
        q.pop();
        const double dx = xy[2 * v] - cx;
        const double dy = xy[2 * v + 1] - cy;
        if (dx * dx + dy * dy <= max_sq) {
            visited_out[v] = 1;
            if (order_out) order_out[count] = v;
            ++count;
            for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
                const int64_t u = indices[e];
                // stale CSR rows may still point at removed nodes; the
                // real graph no longer has those edges
                if (!present[u]) continue;
                if (!seen[u]) {
                    seen[u] = 1;
                    q.push(u);
                }
            }
        }
    }
    return count;
}

// Loop-closure candidate sweep (FindPossibleLoopClosure,
// Mapper.cpp:1960-2010): walk candidate slots in order; collect those
// within sqrt(max_sq) of (cx, cy) that are not near-linked; when a
// candidate leaves the radius, emit the chain if it has >= min_chain.
// present[i]=0 marks removed scans (skipped). Returns chain length
// (indices into the slot array written to chain_out) and updates
// *start_idx to resume the sweep.
int64_t loop_candidate_sweep(
    int64_t n_slots,
    const double* xy,            // (n_slots, 2) candidate positions
    const uint8_t* present,      // (n_slots,)
    const uint8_t* near_linked,  // (n_slots,) 1 = graph-connected
    double cx, double cy, double max_sq,
    int64_t min_chain,
    int64_t* start_idx,          // in/out
    int64_t* chain_out           // (n_slots,)
) {
    int64_t chain_len = 0;
    int64_t i = *start_idx;
    for (; i < n_slots; ++i) {
        if (!present[i]) continue;
        const double dx = xy[2 * i] - cx;
        const double dy = xy[2 * i + 1] - cy;
        if (dx * dx + dy * dy < max_sq) {
            if (near_linked[i]) {
                chain_len = 0;  // linked scan invalidates the chain
            } else {
                chain_out[chain_len++] = i;
            }
        } else {
            if (chain_len >= min_chain) {
                *start_idx = i + 1;
                return chain_len;
            }
            chain_len = 0;
        }
    }
    *start_idx = i;
    return chain_len;  // trailing chain (caller applies no min per ref)
}

// Near-chain walk (FindNearChains, Mapper.cpp:1683-1793), single-sensor
// slot space: for each near scan (BFS order, slots in state-id order),
// extend a contiguous chain outward while candidates stay within
// sqrt(max_sq) of (cx, cy). Encountering the query scan's slot marks the
// chain invalid (it is still walked and marked processed, like the
// reference). Missing state ids simply do not exist in slot space (the
// reference `continue`s over them). Emits (lo, hi, valid) rows; returns
// the row count.
int64_t near_chains_sweep(
    int64_t n,
    const double* xy,          // (n, 2) reference positions
    const uint8_t* present,    // (n,) 0 = removed (walked over, like the
                               // reference continues over missing ids)
    const int64_t* nears,      // (m,) near slots in BFS order
    int64_t m,
    int64_t scan_slot,         // slot of the query scan, or -1
    double cx, double cy, double max_sq,
    uint8_t* processed,        // (n,) zeroed by caller
    int64_t* out               // (m, 3) rows [lo, hi, valid]
) {
    int64_t cnt = 0;
    for (int64_t k = 0; k < m; ++k) {
        const int64_t s = nears[k];
        if (s == scan_slot || processed[s]) continue;
        processed[s] = 1;
        bool valid = true;
        int64_t lo = s, hi = s + 1;
        for (int64_t i = s - 1; i >= 0; --i) {
            if (i == scan_slot) valid = false;
            if (!present[i]) continue;
            const double dx = xy[2 * i] - cx;
            const double dy = xy[2 * i + 1] - cy;
            if (dx * dx + dy * dy < max_sq) {
                lo = i;
                processed[i] = 1;
            } else {
                break;
            }
        }
        for (int64_t i = s + 1; i < n; ++i) {
            if (i == scan_slot) valid = false;
            if (!present[i]) continue;
            const double dx = xy[2 * i] - cx;
            const double dy = xy[2 * i + 1] - cy;
            if (dx * dx + dy * dy < max_sq) {
                hi = i + 1;
                processed[i] = 1;
            } else {
                break;
            }
        }
        out[3 * cnt] = lo;
        out[3 * cnt + 1] = hi;
        out[3 * cnt + 2] = valid ? 1 : 0;
        ++cnt;
    }
    return cnt;
}

// Radius query over all vertices (FindNearByVertices without the KD tree
// — brute force is faster at these sizes and trivially vectorizes).
int64_t radius_query(
    int64_t n,
    const double* xy,
    double cx, double cy, double max_sq,
    int64_t* out_idx
) {
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        const double dx = xy[2 * i] - cx;
        const double dy = xy[2 * i + 1] - cy;
        if (dx * dx + dy * dy <= max_sq) out_idx[count++] = i;
    }
    return count;
}

// Viewpoint-independent structure of ScanMatcher::FindValidPoints
// (Mapper.cpp:1113-1164): walk the beam endpoints keeping a trailing
// anchor; every time the current point is > 0.1 m from the anchor, emit a
// delimiter (anchor recorded) and advance. Returns the delimiter count D;
// fills delim_idx (D), anchors (D,2) and next_delim (n) — the delimiter
// that flushes each point, or -1.
int64_t fvp_structure(
    int64_t n,
    const double* xy,          // (n, 2) beam endpoints (local or world)
    int64_t* delim_idx,        // (n,)
    double* anchors,           // (n, 2)
    int64_t* next_delim        // (n,)
) {
    double ax = 0.0, ay = 0.0;
    bool have_anchor = false;
    int64_t d = 0;
    int64_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
        next_delim[i] = -1;
        const double px = xy[2 * i];
        const double py = xy[2 * i + 1];
        const bool finite =
            px == px && py == py &&
            px - px == 0.0 && py - py == 0.0;  // not NaN/inf
        if (!have_anchor) {
            if (finite) {
                ax = px; ay = py;
                have_anchor = true;
            }
            continue;
        }
        const double dx = ax - px;
        const double dy = ay - py;
        if (dx * dx + dy * dy > 0.01) {  // (0.1 m)^2, strict >
            delim_idx[d] = i;
            anchors[2 * d] = ax;
            anchors[2 * d + 1] = ay;
            for (int64_t j = prev; j < i; ++j) next_delim[j] = d;
            prev = i;
            ax = px; ay = py;
            ++d;
        }
    }
    return d;
}

}  // extern "C"
