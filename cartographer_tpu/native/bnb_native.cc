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
// Semantics are identical to the device matcher and the bench anchor
// (tools/cpu_anchor/bnb_anchor.cc): window-start max pooling with
// MIN_PROBABILITY beyond the grid, uint8 quantization, out-of-grid scan
// points score MIN_PROBABILITY. Agreement with the device matcher is
// test-asserted (tests/test_cpu_anchor.py, tests/test_native_bnb.py).

#include <algorithm>
#include <atomic>
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
  std::vector<std::vector<int32_t>> dx, dy;
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
  }

  float Score(int level, const Candidate& c) const {
    const auto& pool = s.pyr->levels[level];
    const auto& sx = dx[c.angle];
    const auto& sy = dy[c.angle];
    const int h = s.pyr->h, w = s.pyr->w;
    int sum = 0;
    for (int i = 0; i < s.n; ++i) {
      int x = sx[i] + c.x, y = sy[i] + c.y;
      if (x >= 0 && x < w && y >= 0 && y < h) sum += pool[size_t(y) * w + x];
    }
    return (float(sum) / s.n) / kU8Scale + kMinProbability;
  }

  void ScoreAndSort(int level, std::vector<Candidate>* cands) const {
    for (auto& c : *cands) c.score = Score(level, c);
    std::sort(cands->begin(), cands->end(),
              [](const Candidate& a, const Candidate& b) {
                return a.score > b.score;
              });
  }

  float BranchAndBound(const std::vector<Candidate>& cands, int level,
                       float best, Candidate* best_cand) const {
    for (const auto& c : cands) {
      if (c.score <= best) break;
      if (level == 0) {
        best = c.score;
        *best_cand = c;
        continue;
      }
      int half = 1 << (level - 1);
      std::vector<Candidate> children;
      children.reserve(4);
      for (int k = 0; k < 4; ++k) {
        int cx = c.x + (k & 1 ? half : 0);
        int cy = c.y + (k & 2 ? half : 0);
        if (cx > num_linear || cy > num_linear) continue;
        children.push_back({c.angle, cx, cy, 0});
      }
      ScoreAndSort(level - 1, &children);
      best = BranchAndBound(children, level - 1, best, best_cand);
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
    float score = BranchAndBound(top, depth - 1, s.min_score, &best);
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
