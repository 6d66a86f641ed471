// Native loop-closure constraint search backend.
//
// The reference's fast correlative BnB (pyramid + DFS,
// internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc:41-378)
// is cache-resident pointer-chasing: on this project's measurements a
// single CPU core runs the scalar algorithm at ~550 windowed depth-7
// matches/s while the XLA:TPU formulation is gather-bound at ~150 M
// random lookups/s (~5 matches/s for a 256-search drain). The
// TPU-native SYSTEM design is therefore hybrid placement: the frontend,
// SPA solves, and GN refinement run on the TPU; the branch-and-bound
// search runs here, on the host cores, threaded across the drained
// (node, submap) pairs — the same fan-out the reference gives its
// ThreadPool (constraint_builder_2d.cc:102-136).
//
// Beyond the reference's scalar DFS, candidate scoring vectorizes with
// AVX-512 masked gathers: 16 points per instruction, with the bounds
// check folded into the gather mask (masked lanes never touch memory,
// so out-of-grid points contribute 0 == MIN_PROBABILITY exactly like
// the scalar loop). The pyramid levels stay in their compact unpadded
// layout (512^2 level = 256 KB, L2-resident), and sibling candidates
// score in groups of four sharing one pass over the per-angle
// discretized coordinates. Scores are bit-identical to the scalar path.
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
#include <thread>
#include <vector>

namespace {

constexpr float kMinProbability = 0.1f;
constexpr float kMaxProbability = 0.9f;
constexpr float kU8Scale = 255.0f / (kMaxProbability - kMinProbability);

struct Pyramid {
  int h = 0, w = 0, depth = 0;
  // Each level carries 4 bytes of slack: the AVX-512 path gathers
  // 32-bit words at byte granularity, so the last cell's load overreads
  // 3 bytes.
  std::vector<std::vector<uint8_t>> levels;
};

struct Candidate {
  int angle, x, y;
  float score;
};

struct SearchSpec {
  const Pyramid* pyr;
  const float* points;  // [n, 2]
  int n;
  float ox, oy, resolution;
  float ix, iy, itheta;
  float linear_window, angular_window, min_score;
};

struct Matcher {
  const SearchSpec& s;
  std::vector<std::vector<int32_t>> dx, dy, base;  // base = dy*w + dx
  std::vector<float> angles;
  int num_linear = 0;

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
    base.assign(num_scans, std::vector<int32_t>(s.n));
    const int w = s.pyr->w;
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
        base[a][i] = dy[a][i] * w + dx[a][i];
      }
    }
    num_linear = (int)std::ceil(s.linear_window / s.resolution);
    num_linear = std::min(num_linear, std::max(s.pyr->h, s.pyr->w) + 1);
  }

  float Normalize(int sum) const {
    return (float(sum) / s.n) / kU8Scale + kMinProbability;
  }

  int ScoreScalarTail(int level, const Candidate& c, int i0) const {
    const auto& pool = s.pyr->levels[level];
    const auto& sx = dx[c.angle];
    const auto& sy = dy[c.angle];
    const int h = s.pyr->h, w = s.pyr->w;
    int sum = 0;
    for (int i = i0; i < s.n; ++i) {
      int x = sx[i] + c.x, y = sy[i] + c.y;
      if (x >= 0 && x < w && y >= 0 && y < h) sum += pool[size_t(y) * w + x];
    }
    return sum;
  }

  // Score a run of 1-4 candidates sharing one angle in a single pass
  // over the discretized coordinates. AVX-512: the in-grid test becomes
  // the gather mask (unsigned compare catches negatives), so lanes off
  // the grid never load and contribute 0.
  void ScoreRun(int level, Candidate* cs, int k) const {
    int sums[4] = {0, 0, 0, 0};
    int i0 = 0;
#ifdef __AVX512F__
    const uint8_t* pool = s.pyr->levels[level].data();
    const int32_t* px = dx[cs[0].angle].data();
    const int32_t* py = dy[cs[0].angle].data();
    const int32_t* pb = base[cs[0].angle].data();
    const int n = s.n, w = s.pyr->w;
    const __m512i vw = _mm512_set1_epi32(w);
    const __m512i vh = _mm512_set1_epi32(s.pyr->h);
    const __m512i m255 = _mm512_set1_epi32(0xFF);
    const __m512i zero = _mm512_setzero_si512();
    __m512i ox[4], oy[4], ob[4], acc[4];
    for (int j = 0; j < k; ++j) {
      ox[j] = _mm512_set1_epi32(cs[j].x);
      oy[j] = _mm512_set1_epi32(cs[j].y);
      ob[j] = _mm512_set1_epi32(cs[j].y * w + cs[j].x);
      acc[j] = zero;
    }
    for (; i0 + 16 <= n; i0 += 16) {
      const __m512i x = _mm512_loadu_si512(px + i0);
      const __m512i y = _mm512_loadu_si512(py + i0);
      const __m512i b = _mm512_loadu_si512(pb + i0);
      for (int j = 0; j < k; ++j) {
        const __mmask16 m = _mm512_cmplt_epu32_mask(
            _mm512_add_epi32(x, ox[j]), vw)
            & _mm512_cmplt_epu32_mask(_mm512_add_epi32(y, oy[j]), vh);
        const __m512i g = _mm512_mask_i32gather_epi32(
            zero, m, _mm512_add_epi32(b, ob[j]), pool, 1);
        acc[j] = _mm512_add_epi32(acc[j], _mm512_and_si512(g, m255));
      }
    }
    for (int j = 0; j < k; ++j) sums[j] = _mm512_reduce_add_epi32(acc[j]);
#endif
    for (int j = 0; j < k; ++j)
      cs[j].score = Normalize(sums[j] + ScoreScalarTail(level, cs[j], i0));
  }

  // Score candidates grouped into same-angle runs of up to four, then
  // sort by descending score. `cands` is generated angle-major so runs
  // are contiguous.
  void ScoreAndSort(int level, std::vector<Candidate>* cands) const {
    size_t i = 0;
    const size_t m = cands->size();
    while (i < m) {
      size_t j = i + 1;
      while (j < m && j - i < 4 && (*cands)[j].angle == (*cands)[i].angle)
        ++j;
      ScoreRun(level, cands->data() + i, int(j - i));
      i = j;
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
      ScoreRun(level - 1, children, m);
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
  const size_t cells = size_t(h) * w;
  p->levels[0].assign(cells + 4, 0);  // +4: gather overread slack
  for (size_t i = 0; i < cells; ++i) {
    float q = std::round((prob[i] - kMinProbability) * kU8Scale);
    p->levels[0][i] = (uint8_t)std::min(255.0f, std::max(0.0f, q));
  }
  std::vector<uint8_t> row(cells);
  for (int l = 1; l < depth; ++l) {
    const int shift = 1 << (l - 1);
    const auto& prev = p->levels[l - 1];
    auto& cur = p->levels[l];
    cur.assign(cells + 4, 0);
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
          (const Pyramid*)pyramids[i],
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
