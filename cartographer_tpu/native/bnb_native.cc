// Native loop-closure constraint search backend.
//
// The reference's fast correlative BnB (pyramid + DFS,
// internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc:41-378)
// is cache-resident pointer-chasing: on this project's measurements a
// single CPU core runs ~300-500 windowed depth-7 matches/s while the
// XLA:TPU formulation is gather-bound at ~150 M random lookups/s
// (~5 matches/s for a 256-search drain). The TPU-native SYSTEM design is
// therefore hybrid placement: the frontend, SPA solves, and GN
// refinement run on the TPU; the branch-and-bound search runs here, on
// the host cores, threaded across the drained (node, submap) pairs —
// the same fan-out the reference gives its ThreadPool
// (constraint_builder_2d.cc:102-136).
//
// Beyond the reference's scalar DFS, windowed searches take a
// padded-grid fast path: every pyramid level is embedded in a
// zero-margin frame wide enough that any candidate offset stays inside
// the array, so the scoring loop is a single add+load per point with no
// bounds checks (out-of-grid points score MIN_PROBABILITY via the zero
// margin, exactly like the branchy path). Sibling candidates are scored
// in groups of four sharing one pass over the per-angle base-index
// array, which keeps four independent random loads in flight
// (memory-level parallelism is the limiter for L2-resident random
// access). Full-submap (global localization) windows keep the branchy
// path — padding them would square the working set.
//
// Semantics are identical to the device matcher and the bench anchor
// (tools/cpu_anchor/bnb_anchor.cc): window-start max pooling with
// MIN_PROBABILITY beyond the grid, uint8 quantization, out-of-grid scan
// points score MIN_PROBABILITY. Agreement with the device matcher is
// test-asserted (tests/test_cpu_anchor.py, tests/test_native_bnb.py).

#include <algorithm>
#include <atomic>
#ifdef __AVX512F__
#include <immintrin.h>
#endif
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr float kMinProbability = 0.1f;
constexpr float kMaxProbability = 0.9f;
constexpr float kU8Scale = 255.0f / (kMaxProbability - kMinProbability);

struct Pyramid {
  int h = 0, w = 0, depth = 0;
  std::vector<std::vector<uint8_t>> levels;

  // Lazily built zero-padded copies of the levels for the windowed
  // fast path, single-slot cached by pad width (drains share one
  // window). Shared across search threads.
  struct Padded {
    int pad = 0, hp = 0, wp = 0;
    std::vector<std::vector<uint8_t>> levels;
  };
  std::mutex pad_mu;
  std::shared_ptr<const Padded> padded;

  std::shared_ptr<const Padded> GetPadded(int pad) {
    std::lock_guard<std::mutex> lock(pad_mu);
    if (padded && padded->pad == pad) return padded;
    auto p = std::make_shared<Padded>();
    p->pad = pad;
    p->hp = h + 2 * pad;
    p->wp = w + 2 * pad;
    p->levels.resize(depth);
    for (int l = 0; l < depth; ++l) {
      auto& dst = p->levels[l];
      // +4 slack: the AVX-512 scoring path gathers 32-bit words at
      // byte granularity, so the last cell's load overreads 3 bytes.
      dst.assign(size_t(p->hp) * p->wp + 4, 0);
      const auto& src = levels[l];
      for (int y = 0; y < h; ++y)
        std::memcpy(&dst[size_t(y + pad) * p->wp + pad],
                    &src[size_t(y) * w], w);
    }
    padded = p;
    return padded;
  }
};

struct Candidate {
  int angle, x, y;
  float score;
};

struct SearchSpec {
  Pyramid* pyr;
  const float* points;  // [n, 2]
  int n;
  float ox, oy, resolution;
  float ix, iy, itheta;
  float linear_window, angular_window, min_score;
};

struct Matcher {
  const SearchSpec& s;
  std::vector<std::vector<int32_t>> dx, dy;
  std::vector<float> angles;
  int num_linear = 0;

  // Windowed fast path (see file comment).
  bool fast = false;
  int wp = 0;
  std::shared_ptr<const Pyramid::Padded> padded;
  std::vector<std::vector<int32_t>> idx0;  // per angle: clamped base index

  explicit Matcher(const SearchSpec& spec) : s(spec) {}

  void DiscretizeScans() {
    float max_range_sq = 0;
    for (int i = 0; i < s.n; ++i) {
      float x = s.points[2 * i], y = s.points[2 * i + 1];
      max_range_sq = std::max(max_range_sq, x * x + y * y);
    }
    float max_range =
        std::max(std::sqrt(max_range_sq), 3.0f * s.resolution);
    float step = (1.0f - 1e-3f) *
                 std::acos(1.0f - s.resolution * s.resolution /
                                      (2.0f * max_range * max_range));
    int num_angular = (int)std::ceil(s.angular_window / step);
    int num_scans = 2 * num_angular + 1;
    angles.resize(num_scans);
    dx.assign(num_scans, std::vector<int32_t>(s.n));
    dy.assign(num_scans, std::vector<int32_t>(s.n));
    for (int a = 0; a < num_scans; ++a) {
      angles[a] = (a - num_angular) * step;
      float t = s.itheta + angles[a];
      float c = std::cos(t), sn = std::sin(t);
      for (int i = 0; i < s.n; ++i) {
        float px = s.points[2 * i], py = s.points[2 * i + 1];
        float wx = c * px - sn * py + s.ix;
        float wy = sn * px + c * py + s.iy;
        dx[a][i] = (int32_t)std::floor((wx - s.ox) / s.resolution);
        dy[a][i] = (int32_t)std::floor((wy - s.oy) / s.resolution);
      }
    }
    num_linear = (int)std::ceil(s.linear_window / s.resolution);
    num_linear = std::min(num_linear, std::max(s.pyr->h, s.pyr->w) + 1);

    // Windowed fast path: pad 2L+2 keeps every offset in-array and
    // routes any lookup whose unpadded coordinate is off-grid into the
    // zero margin. Points off-grid for EVERY offset in an axis clamp to
    // margin column/row L (its full +-L neighbourhood is margin).
    // Full-submap windows (num_linear > max(h, w)) stay branchy.
    fast = num_linear <= std::max(s.pyr->h, s.pyr->w);
    if (!fast) return;
    const int L = num_linear, pad = 2 * L + 2;
    padded = s.pyr->GetPadded(pad);
    wp = padded->wp;
    const int h = s.pyr->h, w = s.pyr->w;
    idx0.assign(angles.size(), std::vector<int32_t>(s.n));
    for (int a = 0; a < (int)angles.size(); ++a) {
      const auto& sx = dx[a];
      const auto& sy = dy[a];
      auto& base = idx0[a];
      for (int i = 0; i < s.n; ++i) {
        int px = (sx[i] < -L || sx[i] > w - 1 + L) ? L : sx[i] + pad;
        int py = (sy[i] < -L || sy[i] > h - 1 + L) ? L : sy[i] + pad;
        base[i] = py * wp + px;
      }
    }
  }

  float Normalize(int sum) const {
    return (float(sum) / s.n) / kU8Scale + kMinProbability;
  }

  float ScoreSafe(int level, const Candidate& c) const {
    const auto& pool = s.pyr->levels[level];
    const auto& sx = dx[c.angle];
    const auto& sy = dy[c.angle];
    const int h = s.pyr->h, w = s.pyr->w;
    int sum = 0;
    for (int i = 0; i < s.n; ++i) {
      int x = sx[i] + c.x, y = sy[i] + c.y;
      if (x >= 0 && x < w && y >= 0 && y < h) sum += pool[size_t(y) * w + x];
    }
    return Normalize(sum);
  }

  // Score a run of 1-4 candidates sharing one angle in a single pass
  // over the base-index array (fast path only).
  void ScoreRun(int level, Candidate* cs, int k) const {
    const uint8_t* pool = padded->levels[level].data();
    const int32_t* base = idx0[cs[0].angle].data();
    const int n = s.n;
    // The pool is L3-resident at padded sizes; software prefetch keeps
    // ~4x more random loads in flight than the 4 scoring loads alone
    // (base[] is sequential, so the future indices are already known).
    constexpr int kPf = 12;
    if (k == 4) {
      const int o0 = cs[0].y * wp + cs[0].x, o1 = cs[1].y * wp + cs[1].x;
      const int o2 = cs[2].y * wp + cs[2].x, o3 = cs[3].y * wp + cs[3].x;
      int s0 = 0, s1 = 0, s2 = 0, s3 = 0;
      int i = 0;
#ifdef __AVX512F__
      // 16 byte-granular dword gathers per candidate per step; the
      // low byte of each word is the cell (slack bytes in the pool
      // cover the 3-byte overread at the last cell).
      const __m512i m255 = _mm512_set1_epi32(0xFF);
      __m512i a0 = _mm512_setzero_si512(), a1 = _mm512_setzero_si512();
      __m512i a2 = _mm512_setzero_si512(), a3 = _mm512_setzero_si512();
      for (; i + 16 <= n; i += 16) {
        const __m512i b = _mm512_loadu_si512(base + i);
        if (i + 32 <= n) {
          const int32_t bp0 = base[i + 16], bp8 = base[i + 24];
          __builtin_prefetch(pool + bp0 + o0, 0, 1);
          __builtin_prefetch(pool + bp8 + o2, 0, 1);
        }
        a0 = _mm512_add_epi32(
            a0, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o0)), pool, 1)));
        a1 = _mm512_add_epi32(
            a1, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o1)), pool, 1)));
        a2 = _mm512_add_epi32(
            a2, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o2)), pool, 1)));
        a3 = _mm512_add_epi32(
            a3, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o3)), pool, 1)));
      }
      s0 = _mm512_reduce_add_epi32(a0);
      s1 = _mm512_reduce_add_epi32(a1);
      s2 = _mm512_reduce_add_epi32(a2);
      s3 = _mm512_reduce_add_epi32(a3);
#endif
      for (; i < n; ++i) {
        const int32_t b = base[i];
        s0 += pool[b + o0];
        s1 += pool[b + o1];
        s2 += pool[b + o2];
        s3 += pool[b + o3];
      }
      cs[0].score = Normalize(s0);
      cs[1].score = Normalize(s1);
      cs[2].score = Normalize(s2);
      cs[3].score = Normalize(s3);
      return;
    }
    if (k == 2) {
      const int o0 = cs[0].y * wp + cs[0].x, o1 = cs[1].y * wp + cs[1].x;
      int s0 = 0, s1 = 0;
      int i = 0;
#ifdef __AVX512F__
      const __m512i m255 = _mm512_set1_epi32(0xFF);
      __m512i a0 = _mm512_setzero_si512(), a1 = _mm512_setzero_si512();
      for (; i + 16 <= n; i += 16) {
        const __m512i b = _mm512_loadu_si512(base + i);
        if (i + 32 <= n) {
          const int32_t bp0 = base[i + 16], bp8 = base[i + 24];
          __builtin_prefetch(pool + bp0 + o0, 0, 1);
          __builtin_prefetch(pool + bp8 + o1, 0, 1);
        }
        a0 = _mm512_add_epi32(
            a0, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o0)), pool, 1)));
        a1 = _mm512_add_epi32(
            a1, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, _mm512_set1_epi32(o1)), pool, 1)));
      }
      s0 = _mm512_reduce_add_epi32(a0);
      s1 = _mm512_reduce_add_epi32(a1);
#endif
      for (; i < n; ++i) {
        const int32_t b = base[i];
        s0 += pool[b + o0];
        s1 += pool[b + o1];
      }
      cs[0].score = Normalize(s0);
      cs[1].score = Normalize(s1);
      return;
    }
    for (int j = 0; j < k; ++j) {
      const int o = cs[j].y * wp + cs[j].x;
      int sum = 0;
      int i = 0;
#ifdef __AVX512F__
      const __m512i m255 = _mm512_set1_epi32(0xFF);
      const __m512i vo = _mm512_set1_epi32(o);
      __m512i acc = _mm512_setzero_si512();
      for (; i + 16 <= n; i += 16) {
        if (i + 32 <= n) {
          __builtin_prefetch(pool + base[i + 16] + o, 0, 1);
          __builtin_prefetch(pool + base[i + 24] + o, 0, 1);
        }
        const __m512i b = _mm512_loadu_si512(base + i);
        acc = _mm512_add_epi32(
            acc, _mm512_and_si512(m255, _mm512_i32gather_epi32(
                _mm512_add_epi32(b, vo), pool, 1)));
      }
      sum = _mm512_reduce_add_epi32(acc);
#endif
      for (; i < n; ++i) {
        if (i + kPf < n) __builtin_prefetch(pool + base[i + kPf] + o, 0, 1);
        sum += pool[base[i] + o];
      }
      cs[j].score = Normalize(sum);
    }
  }

  // Score candidates grouped into same-angle runs, then sort by
  // descending score. `cands` is generated angle-major so runs are
  // contiguous.
  void ScoreAndSort(int level, std::vector<Candidate>* cands) const {
    if (fast) {
      size_t i = 0;
      const size_t m = cands->size();
      while (i < m) {
        size_t j = i + 1;
        while (j < m && j - i < 4 &&
               (*cands)[j].angle == (*cands)[i].angle)
          ++j;
        ScoreRun(level, cands->data() + i, int(j - i));
        i = j;
      }
    } else {
      for (auto& c : *cands) c.score = ScoreSafe(level, c);
    }
    std::sort(cands->begin(), cands->end(),
              [](const Candidate& a, const Candidate& b) {
                return a.score > b.score;
              });
  }

  float BranchAndBound(const Candidate* cands, int count, int level,
                       float best, Candidate* best_cand) const {
    for (int ci = 0; ci < count; ++ci) {
      const Candidate& c = cands[ci];
      if (c.score <= best) break;
      if (level == 0) {
        best = c.score;
        *best_cand = c;
        continue;
      }
      int half = 1 << (level - 1);
      Candidate children[4];
      int m = 0;
      for (int k = 0; k < 4; ++k) {
        int cx = c.x + (k & 1 ? half : 0);
        int cy = c.y + (k & 2 ? half : 0);
        if (cx > num_linear || cy > num_linear) continue;
        children[m++] = {c.angle, cx, cy, 0};
      }
      if (fast) {
        ScoreRun(level - 1, children, m);
      } else {
        for (int j = 0; j < m; ++j)
          children[j].score = ScoreSafe(level - 1, children[j]);
      }
      // Insertion sort, descending (m <= 4).
      for (int j = 1; j < m; ++j) {
        Candidate t = children[j];
        int k2 = j - 1;
        while (k2 >= 0 && children[k2].score < t.score) {
          children[k2 + 1] = children[k2];
          --k2;
        }
        children[k2 + 1] = t;
      }
      best = BranchAndBound(children, m, level - 1, best, best_cand);
    }
    return best;
  }

  // Returns score; out_pose = (x, y, theta) in world coords; angle < 0
  // means no candidate beat min_score.
  float Match(float* out_pose, int* found) {
    DiscretizeScans();
    const int depth = s.pyr->depth;
    int stride = 1 << (depth - 1);
    std::vector<Candidate> top;
    top.reserve(size_t(angles.size()) *
                ((2 * num_linear) / stride + 1) *
                ((2 * num_linear) / stride + 1));
    for (int a = 0; a < (int)angles.size(); ++a)
      for (int x = -num_linear; x <= num_linear; x += stride)
        for (int y = -num_linear; y <= num_linear; y += stride)
          top.push_back({a, x, y, 0});
    ScoreAndSort(depth - 1, &top);
    Candidate best{-1, 0, 0, 0};
    float score = BranchAndBound(top.data(), (int)top.size(), depth - 1,
                                 s.min_score, &best);
    *found = best.angle >= 0 ? 1 : 0;
    if (best.angle >= 0) {
      out_pose[0] = s.ix + best.x * s.resolution;
      out_pose[1] = s.iy + best.y * s.resolution;
      out_pose[2] = s.itheta + angles[best.angle];
    } else {
      out_pose[0] = out_pose[1] = out_pose[2] = 0.0f;
    }
    return score;
  }
};

}  // namespace

extern "C" {

// Build a pyramid from a probability grid (unknown -> 0.1). Returns an
// opaque handle; destroy with bnb_pyramid_destroy.
void* bnb_pyramid_create(const float* prob, int h, int w, int depth) {
  auto* p = new Pyramid();
  p->h = h;
  p->w = w;
  p->depth = depth;
  p->levels.resize(depth);
  p->levels[0].resize(size_t(h) * w);
  for (size_t i = 0; i < p->levels[0].size(); ++i) {
    float q = std::round((prob[i] - kMinProbability) * kU8Scale);
    p->levels[0][i] = (uint8_t)std::min(255.0f, std::max(0.0f, q));
  }
  std::vector<uint8_t> row(size_t(h) * w);
  for (int l = 1; l < depth; ++l) {
    const int shift = 1 << (l - 1);
    const auto& prev = p->levels[l - 1];
    auto& cur = p->levels[l];
    cur.resize(size_t(h) * w);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        uint8_t a = prev[size_t(y) * w + x];
        uint8_t b = (x + shift < w) ? prev[size_t(y) * w + x + shift] : 0;
        row[size_t(y) * w + x] = std::max(a, b);
      }
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        uint8_t a = row[size_t(y) * w + x];
        uint8_t b = (y + shift < h) ? row[size_t(y + shift) * w + x] : 0;
        cur[size_t(y) * w + x] = std::max(a, b);
      }
  }
  return p;
}

void bnb_pyramid_destroy(void* handle) { delete (Pyramid*)handle; }

// Batch of independent searches fanned across threads.
//   pyramids:   [n] handles (may repeat)
//   clouds:     concatenated [sum(counts), 2] f32 gravity-aligned points
//   offsets:    [n+1] prefix offsets into clouds (in points)
//   params:     [n, 9] f32: origin_x, origin_y, resolution, init_x,
//               init_y, init_theta, linear_window, angular_window,
//               min_score
//   out:        [n, 4] f32: score, x, y, theta
//   out_found:  [n] i32
void bnb_match_batch(void** pyramids, int n, const float* clouds,
                     const int64_t* offsets, const float* params,
                     float* out, int32_t* out_found, int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const float* pr = params + size_t(i) * 9;
      SearchSpec spec{
          (Pyramid*)pyramids[i],
          clouds + 2 * offsets[i],
          (int)(offsets[i + 1] - offsets[i]),
          pr[0], pr[1], pr[2], pr[3], pr[4], pr[5], pr[6], pr[7], pr[8],
      };
      Matcher m(spec);
      int found = 0;
      float score = m.Match(out + size_t(i) * 4 + 1, &found);
      out[size_t(i) * 4] = score;
      out_found[i] = found;
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t - 1);
  for (int k = 1; k < t; ++k) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

}  // extern "C"
