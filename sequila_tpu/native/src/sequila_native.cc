// sequila-tpu native host index — C++17 interval index for the CPU
// execution path.
//
// Role-equivalent of the reference's vendored superintervals C++ library
// (reference superintervals/src/superintervals.hpp: flat sorted arrays,
// branchless binary search, SIMD count loops) but an original design
// shared with the engine's device kernels: one (key,start)-sorted view
// with a running segment max of ends (the candidate-window lower bound),
// plus an independently sorted (key,end) array for BITS counting
// (#start<=qe - #end<qs).  All loops are tight, branch-light, and
// auto-vectorizable; counts/coverage are O(log n) or O(candidates) per
// query like the reference's index queries.
//
// Exposed as a C ABI consumed through ctypes (sequila_tpu/native/loader.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t kBias = int64_t(1) << 31;

inline int64_t comp(int32_t key, int32_t val) {
  return (int64_t(key) << 32) | (int64_t(val) + kBias);
}

struct Index {
  int64_t n = 0;
  // (key,start)-sorted view
  std::vector<int32_t> keys, starts, ends, pos;
  std::vector<int64_t> comp_start;   // comp(key, start), ascending
  std::vector<int64_t> cummax_end;   // running max of comp(key, end)
  std::vector<int64_t> comp_end;     // comp(key, end), sorted by
                                     // (key, end, start desc, pos desc)
  std::vector<int32_t> end_pos;      // original row of each comp_end entry
  bool has_inverted = false;         // any end < start: BITS count invalid
};

inline int64_t lower_bound64(const std::vector<int64_t>& v, int64_t x) {
  return std::lower_bound(v.begin(), v.end(), x) - v.begin();
}

inline int64_t upper_bound64(const std::vector<int64_t>& v, int64_t x) {
  return std::upper_bound(v.begin(), v.end(), x) - v.begin();
}

}  // namespace

extern "C" {

void* si_build(const int32_t* k, const int32_t* s, const int32_t* e,
               int64_t n) {
  auto* idx = new Index();
  idx->n = n;
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (k[a] != k[b]) return k[a] < k[b];
    if (s[a] != s[b]) return s[a] < s[b];
    return e[a] < e[b];
  });
  idx->keys.resize(n);
  idx->starts.resize(n);
  idx->ends.resize(n);
  idx->pos.resize(n);
  idx->comp_start.resize(n);
  idx->cummax_end.resize(n);
  idx->comp_end.resize(n);
  int64_t running = INT64_MIN;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t o = order[i];
    idx->keys[i] = k[o];
    idx->starts[i] = s[o];
    idx->ends[i] = e[o];
    idx->pos[i] = int32_t(o);
    idx->comp_start[i] = comp(k[o], s[o]);
    running = std::max(running, comp(k[o], e[o]));
    idx->cummax_end[i] = running;
    if (e[o] < s[o]) idx->has_inverted = true;
  }
  // (key, end)-sorted view with positions: the predecessor of
  // lower_bound(comp(key, qs)) is the max-end-below-qs interval — the
  // O(log n) upstream-nearest candidate.  Ties on end keep the smallest
  // (start, row) LAST so the predecessor matches the old linear scan's
  // "first strictly-greater end in (key,start) order" winner.
  std::vector<int64_t> eorder(n);
  for (int64_t i = 0; i < n; ++i) eorder[i] = i;
  std::sort(eorder.begin(), eorder.end(), [&](int64_t a, int64_t b) {
    if (k[a] != k[b]) return k[a] < k[b];
    if (e[a] != e[b]) return e[a] < e[b];
    if (s[a] != s[b]) return s[a] > s[b];
    return a > b;
  });
  idx->end_pos.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t o = eorder[i];
    idx->comp_end[i] = comp(k[o], e[o]);
    idx->end_pos[i] = int32_t(o);
  }
  return idx;
}

void si_free(void* h) { delete static_cast<Index*>(h); }

// Exact per-query overlap counts (BITS; degenerate qs>qe rows scanned).
void si_count(void* h, const int32_t* qk, const int32_t* qs,
              const int32_t* qe, int64_t m, int64_t* out) {
  auto* idx = static_cast<Index*>(h);
  for (int64_t i = 0; i < m; ++i) {
    if (qs[i] <= qe[i] && !idx->has_inverted) {
      const int64_t ub = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
      const int64_t lb = lower_bound64(idx->comp_end, comp(qk[i], qs[i]));
      out[i] = ub - lb;
    } else {
      // exact scan: stabbing probes (qs > qe) or inverted build
      // intervals (end < start), where the BITS subset argument fails
      const int64_t ub = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
      const int64_t lo =
          lower_bound64(idx->cummax_end, comp(qk[i], qs[i]));
      int64_t c = 0;
      for (int64_t j = lo; j < ub; ++j)
        c += (idx->ends[j] >= qs[i]) & (idx->keys[j] == qk[i]);
      out[i] = c;
    }
  }
}

// Two-mode pair emission: if out_b == nullptr, only count (returns total);
// otherwise fill up to cap pairs (build_row, probe_row), probe-major.
int64_t si_pairs(void* h, const int32_t* qk, const int32_t* qs,
                 const int32_t* qe, int64_t m, int32_t* out_b,
                 int32_t* out_p, int64_t cap) {
  auto* idx = static_cast<Index*>(h);
  int64_t written = 0;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t ub = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
    const int64_t lo = lower_bound64(idx->cummax_end, comp(qk[i], qs[i]));
    for (int64_t j = lo; j < ub; ++j) {
      if (idx->ends[j] >= qs[i] && idx->keys[j] == qk[i]) {
        if (out_b != nullptr) {
          if (written >= cap) return -1;  // caller must grow and retry
          out_b[written] = idx->pos[j];
          out_p[written] = int32_t(i);
        }
        ++written;
      }
    }
  }
  return written;
}

// Nearest: first overlap else min-distance (ties upstream); -1 if no
// same-key interval exists.
void si_nearest(void* h, const int32_t* qk, const int32_t* qs,
                const int32_t* qe, int64_t m, int64_t* out) {
  auto* idx = static_cast<Index*>(h);
  for (int64_t i = 0; i < m; ++i) {
    out[i] = -1;
    const int64_t seg_lo =
        lower_bound64(idx->comp_start, int64_t(qk[i]) << 32);
    const int64_t seg_hi =
        upper_bound64(idx->comp_start, (int64_t(qk[i]) << 32) | 0xFFFFFFFFll);
    if (seg_lo >= seg_hi) continue;
    // overlap scan over the candidate window
    const int64_t ub = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
    const int64_t lo =
        std::max(seg_lo, lower_bound64(idx->cummax_end, comp(qk[i], qs[i])));
    int64_t found = -1;
    for (int64_t j = lo; j < ub; ++j) {
      if (idx->ends[j] >= qs[i] && idx->keys[j] == qk[i]) {
        found = idx->pos[j];
        break;
      }
    }
    if (found >= 0) {
      out[i] = found;
      continue;
    }
    // nearest: best upstream (max end < qs, via the (key,end)-sorted
    // array — O(log n)) vs best downstream
    int64_t best_d = INT64_MAX;
    int64_t best = -1;
    const int64_t e_seg_lo =
        lower_bound64(idx->comp_end, int64_t(qk[i]) << 32);
    const int64_t e_lb = lower_bound64(idx->comp_end, comp(qk[i], qs[i]));
    if (e_lb > e_seg_lo) {
      const int32_t up_end =
          int32_t((idx->comp_end[e_lb - 1] & 0xFFFFFFFFll) - kBias);
      best_d = int64_t(qs[i]) - up_end;
      best = idx->end_pos[e_lb - 1];
    }
    const int64_t dn = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
    if (dn < seg_hi && idx->keys[dn] == qk[i]) {
      const int64_t d = int64_t(idx->starts[dn]) - qe[i];
      if (d < best_d) {
        best_d = d;
        best = idx->pos[dn];
      }
    }
    out[i] = best;
  }
}

// Coverage: (count, sum(min(end,qe) - max(start,qs))) per query —
// superintervals coverage semantics.
void si_coverage(void* h, const int32_t* qk, const int32_t* qs,
                 const int32_t* qe, int64_t m, int64_t* out_count,
                 int64_t* out_bases) {
  auto* idx = static_cast<Index*>(h);
  for (int64_t i = 0; i < m; ++i) {
    const int64_t ub = upper_bound64(idx->comp_start, comp(qk[i], qe[i]));
    const int64_t lo = lower_bound64(idx->cummax_end, comp(qk[i], qs[i]));
    int64_t c = 0, bases = 0;
    for (int64_t j = lo; j < ub; ++j) {
      if (idx->ends[j] >= qs[i] && idx->keys[j] == qk[i]) {
        ++c;
        bases += std::min(int64_t(idx->ends[j]), int64_t(qe[i])) -
                 std::max(int64_t(idx->starts[j]), int64_t(qs[i]));
      }
    }
    out_count[i] = c;
    out_bases[i] = bases;
  }
}

// Expand contiguous index runs into build rows: for each run i,
// out[j..j+cnt[i]) = pos[g0[i] .. g0[i]+cnt[i]) — the host half of the
// device join's run-compacted emission (ops/interval_join.py ships
// (run start, length) pairs over the device link and expands here).
// One linear memcpy-like pass; ~5x numpy's repeat/arange/gather chain.
void si_expand_runs(const int32_t* g0, const int32_t* cnt, int64_t nruns,
                    const int32_t* pos, int32_t* out) {
  int64_t j = 0;
  for (int64_t i = 0; i < nruns; ++i) {
    const int32_t c = cnt[i];
    const int32_t* p = pos + g0[i];
    std::memcpy(out + j, p, size_t(c) * sizeof(int32_t));
    j += c;
  }
}

// RLE-expand per-probe match counts into probe row ids (probe-major
// pair order): out[j] = i repeated counts[i] times.
void si_repeat_counts(const int32_t* counts, int64_t m, int32_t* out) {
  int64_t j = 0;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t c = counts[i];
    for (int64_t r = 0; r < c; ++r) out[j + r] = int32_t(i);
    j += c;
  }
}

int64_t si_version() { return 2; }

}  // extern "C"
