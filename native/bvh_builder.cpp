// Native BVH builder for pathtrace_tpu.
//
// C++ implementation of the host-side build that models the reference's
// arena BVH construction strategy (reference src/collision/bvh.rs:268-333):
// random-axis median split over primitive AABB minima, one primitive per
// leaf, emitted directly in DFS pre-order with escape indices for the
// device-side stackless traversal (see pathtrace_tpu/models/bvh.py).
//
// Exposed via a C ABI for ctypes; built by native/Makefile into
// libpathtrace_native.so.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// xorshift64* — tiny deterministic PRNG for the split-axis choice
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1Dull;
  }
  int axis() { return static_cast<int>(next() % 3); }
};

struct Builder {
  const float* bb_min;   // [n_total, 3]
  const float* bb_max;
  float* out_min;        // [2n-1, 3]
  float* out_max;
  int32_t* out_escape;
  int32_t* out_prim;
  int32_t node_count = 0;
  int32_t leaf_count = 0;
  int32_t max_depth = 0;
  int strategy = 0;      // 0 = random-axis median, 1 = full-sweep SAH
  Rng rng;
  // SAH scratch (reused across nodes to avoid per-node allocation)
  std::vector<float> centroid;   // [(max_id+1) * 3]
  std::vector<double> area_l, area_r;

  explicit Builder(uint64_t seed) : rng(seed) {}

  int32_t emit(const float mn[3], const float mx[3], int32_t prim) {
    int32_t i = node_count++;
    std::memcpy(out_min + 3 * i, mn, 3 * sizeof(float));
    std::memcpy(out_max + 3 * i, mx, 3 * sizeof(float));
    out_prim[i] = prim;
    return i;
  }

  // Full-sweep SAH: try all 3 axes (centroid-sorted), pick the split
  // minimizing area_L*n_L + area_R*n_R. Leaves ids[lo,hi) sorted along
  // the winning axis and returns the split point. Matches the numpy
  // reference (_build_numpy_sah) choice-for-choice: same cost function,
  // same stable sort keys, same argmin tie-breaking (first minimum).
  int32_t sah_split(int32_t* ids, int32_t lo, int32_t hi) {
    const int32_t n = hi - lo;
    area_l.resize(n);
    area_r.resize(n);
    base_order.assign(ids + lo, ids + hi);
    best_perm.resize(n);
    double best_cost = 0.0;
    int best_axis = -1;
    int32_t best_mid = lo + n / 2;
    for (int axis = 0; axis < 3; ++axis) {
      int32_t* s = ids + lo;
      if (axis > 0) {
        // stable sorts must start from the canonical entry order —
        // centroids can tie, and the numpy twin sorts each axis from the
        // node's entry subset
        std::memcpy(s, base_order.data(), n * sizeof(int32_t));
      }
      std::stable_sort(s, s + n, [&](int32_t a, int32_t b) {
        return centroid[3 * a + axis] < centroid[3 * b + axis];
      });
      // prefix areas
      float mnc[3] = {3.4e38f, 3.4e38f, 3.4e38f};
      float mxc[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
      for (int32_t i = 0; i < n; ++i) {
        const float* pmn = bb_min + 3 * s[i];
        const float* pmx = bb_max + 3 * s[i];
        for (int a = 0; a < 3; ++a) {
          mnc[a] = std::min(mnc[a], pmn[a]);
          mxc[a] = std::max(mxc[a], pmx[a]);
        }
        // areas stay in float so every product/sum rounds exactly like the
        // numpy twin's f32 half_area — a double-precision intermediate
        // here can flip the argmin on near-tie splits and break the
        // node-for-node build equality the tests assert
        const float dx = std::max(mxc[0] - mnc[0], 0.0f);
        const float dy = std::max(mxc[1] - mnc[1], 0.0f);
        const float dz = std::max(mxc[2] - mnc[2], 0.0f);
        area_l[i] = dx * dy + dy * dz + dx * dz;
      }
      // suffix areas
      for (int a = 0; a < 3; ++a) {
        mnc[a] = 3.4e38f;
        mxc[a] = -3.4e38f;
      }
      for (int32_t i = n - 1; i >= 0; --i) {
        const float* pmn = bb_min + 3 * s[i];
        const float* pmx = bb_max + 3 * s[i];
        for (int a = 0; a < 3; ++a) {
          mnc[a] = std::min(mnc[a], pmn[a]);
          mxc[a] = std::max(mxc[a], pmx[a]);
        }
        const float dx = std::max(mxc[0] - mnc[0], 0.0f);
        const float dy = std::max(mxc[1] - mnc[1], 0.0f);
        const float dz = std::max(mxc[2] - mnc[2], 0.0f);
        area_r[i] = dx * dy + dy * dz + dx * dz;
      }
      for (int32_t k = 1; k < n; ++k) {
        const double cost =
            area_l[k - 1] * static_cast<double>(k) +
            area_r[k] * static_cast<double>(n - k);
        if (best_axis < 0 || cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_mid = lo + k;
          std::memcpy(best_perm.data(), s, n * sizeof(int32_t));
        }
      }
    }
    std::memcpy(ids + lo, best_perm.data(), n * sizeof(int32_t));
    return best_mid;
  }

  std::vector<int32_t> base_order;  // node's ids in entry order (SAH)
  std::vector<int32_t> best_perm;

  // Emits the subtree over ids[lo, hi) in pre-order; returns subtree size.
  int32_t build(int32_t* ids, int32_t lo, int32_t hi, int32_t depth) {
    max_depth = std::max(max_depth, depth);
    float mn[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float mx[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int32_t i = lo; i < hi; ++i) {
      const float* pmn = bb_min + 3 * ids[i];
      const float* pmx = bb_max + 3 * ids[i];
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], pmn[a]);
        mx[a] = std::max(mx[a], pmx[a]);
      }
    }
    if (hi - lo == 1) {
      ++leaf_count;
      emit(mn, mx, ids[lo]);
      return 1;
    }
    int32_t mid;
    if (strategy == 1 && depth < 64) {
      mid = sah_split(ids, lo, hi);
    } else if (strategy == 1) {
      // depth guard: SAH splits can be arbitrarily lopsided in adversarial
      // inputs; past depth 64 fall back to an axis-0 centroid median
      // (deterministic — mirrors the numpy builder's guard exactly)
      std::stable_sort(ids + lo, ids + hi, [&](int32_t a, int32_t b) {
        return centroid[3 * a] < centroid[3 * b];
      });
      mid = lo + (hi - lo) / 2;
    } else {
      // random-axis median split on AABB min (stable, like the reference)
      int axis = rng.axis();
      std::stable_sort(ids + lo, ids + hi, [&](int32_t a, int32_t b) {
        return bb_min[3 * a + axis] < bb_min[3 * b + axis];
      });
      mid = lo + (hi - lo) / 2;
    }
    int32_t me = emit(mn, mx, -1);
    int32_t ls = build(ids, lo, mid, depth + 1);
    int32_t rs = build(ids, mid, hi, depth + 1);
    int32_t size = 1 + ls + rs;
    out_escape[me] = me + size;  // next pre-order node outside this subtree
    return size;
  }
};

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on error.
// out_* arrays must hold at least 2*n_ids - 1 entries ([*3] for boxes).
// out_stats: {node_count, leaf_count, max_depth}.
int32_t ptpu_build_bvh(
    const float* bb_min, const float* bb_max,
    const int32_t* ids, int32_t n_ids, uint64_t seed,
    float* out_min, float* out_max,
    int32_t* out_escape, int32_t* out_prim,
    int32_t* out_stats) {
  if (n_ids <= 0) return -1;
  Builder b(seed);
  b.bb_min = bb_min;
  b.bb_max = bb_max;
  b.out_min = out_min;
  b.out_max = out_max;
  b.out_escape = out_escape;
  b.out_prim = out_prim;

  std::vector<int32_t> work(ids, ids + n_ids);
  int32_t total = b.build(work.data(), 0, n_ids, 1);
  // leaves escape to the next pre-order node
  for (int32_t i = 0; i < b.node_count; ++i) {
    if (b.out_prim[i] >= 0) b.out_escape[i] = i + 1;
  }
  (void)total;
  out_stats[0] = b.node_count;
  out_stats[1] = b.leaf_count;
  out_stats[2] = b.max_depth;
  return b.node_count;
}

// v2: adds `strategy` (0 = random-axis median, 1 = full-sweep SAH).
int32_t ptpu_build_bvh_v2(
    const float* bb_min, const float* bb_max,
    const int32_t* ids, int32_t n_ids, uint64_t seed, int32_t strategy,
    float* out_min, float* out_max,
    int32_t* out_escape, int32_t* out_prim,
    int32_t* out_stats) {
  if (n_ids <= 0) return -1;
  Builder b(seed);
  b.strategy = strategy;
  b.bb_min = bb_min;
  b.bb_max = bb_max;
  b.out_min = out_min;
  b.out_max = out_max;
  b.out_escape = out_escape;
  b.out_prim = out_prim;
  if (strategy == 1) {
    int32_t max_id = 0;
    for (int32_t i = 0; i < n_ids; ++i) max_id = std::max(max_id, ids[i]);
    b.centroid.resize(3 * (max_id + 1));
    for (int32_t i = 0; i < n_ids; ++i) {
      const int32_t p = ids[i];
      for (int a = 0; a < 3; ++a) {
        b.centroid[3 * p + a] =
            0.5f * (bb_min[3 * p + a] + bb_max[3 * p + a]);
      }
    }
  }
  std::vector<int32_t> work(ids, ids + n_ids);
  (void)b.build(work.data(), 0, n_ids, 1);
  for (int32_t i = 0; i < b.node_count; ++i) {
    if (b.out_prim[i] >= 0) b.out_escape[i] = i + 1;
  }
  out_stats[0] = b.node_count;
  out_stats[1] = b.leaf_count;
  out_stats[2] = b.max_depth;
  return b.node_count;
}

}  // extern "C"
