// euler_tpu native core: multithreaded graph loading primitives.
//
// TPU-native counterpart of the reference's C++ graph build path
// (reference: euler/core/graph/graph_builder.cc:57-157 — 8-thread
// partition load into edge-type-grouped neighbor arrays with prefix-sum
// weights — and euler/common/alias_method.cc AliasMethod::Init).
//
// The device consumes flat arrays (see euler_tpu/graph/convert.py); this
// library produces them at native speed for multi-hundred-million-edge
// graphs: a parallel counting-sort CSR build over (src, etype) groups with
// per-group dst ordering, weight prefix sums, group weight sums, and O(n)
// alias-table construction. Exposed with a plain C ABI for ctypes.
//
// Build: cc -O3 -shared -fPIC -pthread csrc/euler_core.cc -o
//        euler_tpu/native/libeuler_core.so
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 8;
}

template <typename F>
void parallel_for(int64_t n, F fn) {
  int nt = std::min<int64_t>(hardware_threads(), std::max<int64_t>(n, 1));
  if (n < (1 << 15) || nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Sorts m edges by (src, etype, dst) into CSR group layout.
// Outputs (caller-allocated):
//   group_ptr   int64 [n*n_et + 1]
//   perm        int64 [m]       original row of each CSR slot
//   col         int32 [m]       dst sorted
//   w_sorted    float [m]
//   w_cumsum    float [m]       running prefix sum (float64 accumulated)
//   group_w_sum float [n*n_et]
// Returns 0 on success.
int etpu_build_csr(int64_t n, int64_t n_et, int64_t m, const int32_t* src,
                   const int32_t* dst, const int32_t* etype, const float* w,
                   int64_t* group_ptr, int64_t* perm, int32_t* col,
                   float* w_sorted, float* w_cumsum, float* group_w_sum) {
  const int64_t g = n * n_et;
  std::vector<std::atomic<int64_t>> cnt(g + 1);
  for (auto& c : cnt) c.store(0, std::memory_order_relaxed);

  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t key = static_cast<int64_t>(src[i]) * n_et + etype[i];
      if (key < 0 || key >= g) return;  // corrupt input guard
      cnt[key + 1].fetch_add(1, std::memory_order_relaxed);
    }
  });
  group_ptr[0] = 0;
  for (int64_t i = 0; i < g; ++i)
    group_ptr[i + 1] = group_ptr[i] + cnt[i + 1].load();
  if (group_ptr[g] != m) return 1;

  // scatter edges into their group (atomic bump per group)
  std::vector<std::atomic<int64_t>> cursor(g);
  for (int64_t i = 0; i < g; ++i)
    cursor[i].store(group_ptr[i], std::memory_order_relaxed);
  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t key = static_cast<int64_t>(src[i]) * n_et + etype[i];
      int64_t slot = cursor[key].fetch_add(1, std::memory_order_relaxed);
      perm[slot] = i;
    }
  });

  // sort within each group by dst (parallel over groups)
  parallel_for(g, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      int64_t a = group_ptr[k], b = group_ptr[k + 1];
      std::sort(perm + a, perm + b, [&](int64_t x, int64_t y) {
        return dst[x] < dst[y];
      });
    }
  });

  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      col[i] = dst[perm[i]];
      w_sorted[i] = w[perm[i]];
    }
  });

  double acc = 0.0;
  for (int64_t i = 0; i < m; ++i) {
    acc += w_sorted[i];
    w_cumsum[i] = static_cast<float>(acc);
  }
  parallel_for(g, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      double s = 0.0;
      for (int64_t i = group_ptr[k]; i < group_ptr[k + 1]; ++i)
        s += w_sorted[i];
      group_w_sum[k] = static_cast<float>(s);
    }
  });
  return 0;
}

// Vose alias table: prob/alias (caller-allocated, size n). Zero or
// non-finite total weight falls back to uniform, matching the python
// implementation (euler_tpu/ops/alias.py).
int etpu_build_alias(int64_t n, const float* w, float* prob,
                     int32_t* alias) {
  if (n == 0) return 0;
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) total += w[i];
  std::vector<double> p(n);
  if (!(total > 0.0) || !std::isfinite(total)) {
    for (int64_t i = 0; i < n; ++i) p[i] = 1.0;
  } else {
    for (int64_t i = 0; i < n; ++i) p[i] = w[i] * (n / total);
  }
  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    prob[i] = 1.0f;
    alias[i] = static_cast<int32_t>(i);
    (p[i] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back(); small.pop_back();
    int64_t l = large.back(); large.pop_back();
    prob[s] = static_cast<float>(p[s]);
    alias[s] = static_cast<int32_t>(l);
    p[l] = (p[l] + p[s]) - 1.0;
    (p[l] < 1.0 ? small : large).push_back(l);
  }
  return 0;
}

// Per-group alias tables over CSR segments: for each group k with slots
// [group_ptr[k], group_ptr[k+1]) builds a Vose table over its weights.
// alias values are WITHIN-GROUP slot offsets. O(1) weighted neighbor
// draws replace the O(log E) cumsum binary search — the role of the
// reference's per-neighbor-group CompactWeightedCollection
// (compact_weighted_collection.h:54-100) with alias- instead of
// CDF-sampling (strictly fewer random HBM reads per draw on device).
int etpu_build_group_alias(int64_t n_groups, int64_t m,
                           const int64_t* group_ptr, const float* w,
                           float* prob, int32_t* alias) {
  std::atomic<int> rc(0);
  parallel_for(n_groups, [&](int64_t glo, int64_t ghi) {
    std::vector<double> p;
    std::vector<int64_t> small, large;
    for (int64_t k = glo; k < ghi; ++k) {
      int64_t a = group_ptr[k], b = group_ptr[k + 1];
      if (a < 0 || b < a || b > m) { rc.store(1); return; }
      int64_t n = b - a;
      if (n == 0) continue;
      double total = 0.0;
      for (int64_t i = a; i < b; ++i) total += w[i];
      p.assign(n, 1.0);
      if (total > 0.0 && std::isfinite(total)) {
        for (int64_t i = 0; i < n; ++i) p[i] = w[a + i] * (n / total);
      }
      small.clear();
      large.clear();
      for (int64_t i = 0; i < n; ++i) {
        prob[a + i] = 1.0f;
        alias[a + i] = static_cast<int32_t>(i);
        (p[i] < 1.0 ? small : large).push_back(i);
      }
      while (!small.empty() && !large.empty()) {
        int64_t s = small.back(); small.pop_back();
        int64_t l = large.back(); large.pop_back();
        prob[a + s] = static_cast<float>(p[s]);
        alias[a + s] = static_cast<int32_t>(l);
        p[l] = (p[l] + p[s]) - 1.0;
        (p[l] < 1.0 ? small : large).push_back(l);
      }
    }
  });
  return rc.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Edge-list text parsing: "src<sep>dst[<sep>weight]" lines, '#' comments.
//
// The streaming converter's hot loop (euler_tpu/graph/stream_convert.py
// convert_edge_list) — a Python line loop tops out around 1M lines/s,
// which turns an ogbn-papers100M-scale ingest into hours; this parser
// does a two-pass parallel scan (line starts, then per-range parsing
// into exact output offsets so edge order == file order). Plays the
// file-ingest role of the reference's converter + loader pipeline
// (euler/tools/generate_euler_data.py feeding graph_builder.cc).
// ---------------------------------------------------------------------------

namespace {

inline const char* skip_sep(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == ',')) ++p;
  return p;
}

inline bool parse_i64(const char*& p, const char* end, int64_t* out) {
  p = skip_sep(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  if (p >= end || *p < '0' || *p > '9') return false;
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  *out = neg ? -v : v;
  return true;
}

inline bool parse_f32(const char*& p, const char* end, float* out) {
  p = skip_sep(p, end);
  char tmp[64];
  int n = 0;
  while (p + n < end && n < 63 && *(p + n) != '\n' && *(p + n) != ' ' &&
         *(p + n) != '\t' && *(p + n) != ',' && *(p + n) != '\r')
    ++n;
  if (n == 0) return false;
  std::memcpy(tmp, p, n);
  tmp[n] = 0;
  char* q = nullptr;
  float v = std::strtof(tmp, &q);
  if (q == tmp) return false;
  p += n;
  *out = v;
  return true;
}

// parse lines in [lo, hi) of buf; returns count written at out+off
int64_t parse_range(const char* buf, int64_t lo, int64_t hi,
                    int32_t* src, int32_t* dst, float* w, int64_t off) {
  const char* p = buf + lo;
  const char* end = buf + hi;
  int64_t k = off;
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        std::memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = skip_sep(p, line_end);
    if (q < line_end && *q != '#') {
      int64_t a, b;
      const char* r = q;
      if (parse_i64(r, line_end, &a) && parse_i64(r, line_end, &b) &&
          a >= 0 && b >= 0 && a < (1LL << 31) && b < (1LL << 31)) {
        float wv = 1.0f;
        const char* r2 = r;
        if (!parse_f32(r2, line_end, &wv)) wv = 1.0f;
        src[k] = static_cast<int32_t>(a);
        dst[k] = static_cast<int32_t>(b);
        w[k] = wv;
        ++k;
      }
    }
    p = line_end + 1;
  }
  return k - off;
}

}  // namespace

extern "C" int64_t etpu_parse_edge_list(const char* buf, int64_t len,
                                        int32_t* src, int32_t* dst,
                                        float* w, int64_t cap) {
  if (len <= 0) return 0;
  int nt = std::min<int64_t>(hardware_threads(), 16);
  if (len < (1 << 20)) nt = 1;
  // chunk boundaries snapped to newlines
  std::vector<int64_t> bounds(nt + 1, 0);
  bounds[nt] = len;
  for (int t = 1; t < nt; ++t) {
    int64_t pos = len * t / nt;
    const char* nl = static_cast<const char*>(
        std::memchr(buf + pos, '\n', len - pos));
    bounds[t] = nl ? (nl - buf) + 1 : len;
  }
  for (int t = 1; t < nt; ++t)
    bounds[t] = std::max(bounds[t], bounds[t - 1]);
  // pass 1: count valid lines per chunk (into scratch at tail of out?
  // just parse twice-cheap: count only)
  std::vector<int64_t> counts(nt, 0);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&, t] {
      const char* p = buf + bounds[t];
      const char* end = buf + bounds[t + 1];
      int64_t c = 0;
      while (p < end) {
        const char* line_end = static_cast<const char*>(
            std::memchr(p, '\n', end - p));
        if (!line_end) line_end = end;
        const char* q = skip_sep(p, line_end);
        if (q < line_end && *q != '#') {
          int64_t a, b;
          const char* r = q;
          if (parse_i64(r, line_end, &a) && parse_i64(r, line_end, &b) &&
              a >= 0 && b >= 0 && a < (1LL << 31) && b < (1LL << 31))
            ++c;
        }
        p = line_end + 1;
      }
      counts[t] = c;
    });
  }
  for (auto& th : ts) th.join();
  std::vector<int64_t> offs(nt + 1, 0);
  for (int t = 0; t < nt; ++t) offs[t + 1] = offs[t] + counts[t];
  if (offs[nt] > cap) return -1;
  // pass 2: parse into exact offsets (order == file order)
  ts.clear();
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&, t] {
      parse_range(buf, bounds[t], bounds[t + 1], src, dst, w, offs[t]);
    });
  }
  for (auto& th : ts) th.join();
  return offs[nt];
}
