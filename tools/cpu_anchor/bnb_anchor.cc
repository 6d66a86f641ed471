// CPU anchor for the loop-closure throughput baseline (BASELINE.md).
//
// A faithful single-threaded C++ implementation of the reference's
// fast correlative scan matching algorithm — multi-resolution max-pool
// precomputation grids + depth-first branch-and-bound over
// (angle, x, y) offsets — re-derived from the algorithm description
// (Hess et al., ICRA 2016; reference semantics:
// internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc:41-378).
// NOT a copy of the reference source: independent code, same algorithm,
// so that `matches/s on one CPU core of THIS host` is a measured anchor
// for bench.py's loop-closure row instead of a documented estimate.
//
// Semantics intentionally mirror cartographer_tpu's device matcher
// (ops/scan_matching/fast_correlative_2d.py) so the harness can assert
// both find the same pose on the same inputs:
//  * pyramid level l pools the 2^l x 2^l window STARTING at each cell;
//    windows shifted beyond the grid read MIN_PROBABILITY,
//  * cells are uint8-quantized: (p - 0.1) / 0.8 * 255,
//  * out-of-grid scan points score MIN_PROBABILITY (no ShrinkToFit).
//
// Input (little-endian binary, written by run_anchor.py):
//   int32  H, W, depth, N, repeats
//   f32    resolution, origin_x, origin_y
//   f32    init_x, init_y, init_theta
//   f32    linear_window, angular_window, min_score
//   f32    prob[H*W]          row-major probability (unknown -> 0.1)
//   f32    points[N*2]        gravity-aligned scan (x, y)
//
// Output: one JSON line with per-match wall time and the best match.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr float kMinProbability = 0.1f;
constexpr float kMaxProbability = 0.9f;
constexpr float kU8Scale = 255.0f / (kMaxProbability - kMinProbability);

struct Candidate {
  int angle;
  int x;  // cell offset
  int y;
  float score;
};

struct Input {
  int h, w, depth, n, repeats;
  float resolution, ox, oy;
  float ix, iy, itheta;
  float linear_window, angular_window, min_score;
  std::vector<float> prob;
  std::vector<float> pts;
};

bool ReadInput(const char* path, Input* in) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  int32_t head[5];
  if (std::fread(head, 4, 5, f) != 5) return false;
  in->h = head[0];
  in->w = head[1];
  in->depth = head[2];
  in->n = head[3];
  in->repeats = head[4];
  float fh[9];
  if (std::fread(fh, 4, 9, f) != 9) return false;
  in->resolution = fh[0];
  in->ox = fh[1];
  in->oy = fh[2];
  in->ix = fh[3];
  in->iy = fh[4];
  in->itheta = fh[5];
  in->linear_window = fh[6];
  in->angular_window = fh[7];
  in->min_score = fh[8];
  in->prob.resize(size_t(in->h) * in->w);
  in->pts.resize(size_t(in->n) * 2);
  if (std::fread(in->prob.data(), 4, in->prob.size(), f) != in->prob.size())
    return false;
  if (std::fread(in->pts.data(), 4, in->pts.size(), f) != in->pts.size())
    return false;
  std::fclose(f);
  return true;
}

// Precomputation pyramid: levels[l][y * w + x] = max of the quantized
// probability over the 2^l x 2^l window starting at (x, y), built by
// iterated shift-max doubling (shifted-in cells read 0 == MIN_PROBABILITY,
// preserving the admissible bound exactly like the device pyramid).
std::vector<std::vector<uint8_t>> BuildPyramid(const Input& in) {
  const int h = in.h, w = in.w;
  std::vector<std::vector<uint8_t>> levels(in.depth);
  levels[0].resize(size_t(h) * w);
  for (size_t i = 0; i < levels[0].size(); ++i) {
    float q = std::round((in.prob[i] - kMinProbability) * kU8Scale);
    levels[0][i] = (uint8_t)std::min(255.0f, std::max(0.0f, q));
  }
  for (int l = 1; l < in.depth; ++l) {
    const int shift = 1 << (l - 1);
    const auto& prev = levels[l - 1];
    auto& cur = levels[l];
    cur.resize(size_t(h) * w);
    // rows: max(prev, shift_x(prev))
    std::vector<uint8_t> row(size_t(h) * w);
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        uint8_t a = prev[size_t(y) * w + x];
        uint8_t b = (x + shift < w) ? prev[size_t(y) * w + x + shift] : 0;
        row[size_t(y) * w + x] = std::max(a, b);
      }
    }
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        uint8_t a = row[size_t(y) * w + x];
        uint8_t b = (y + shift < h) ? row[size_t(y + shift) * w + x] : 0;
        cur[size_t(y) * w + x] = std::max(a, b);
      }
    }
  }
  return levels;
}

struct Matcher {
  const Input& in;
  std::vector<std::vector<uint8_t>> pyramid;
  // Discretized scan per candidate angle (DiscretizeScans).
  std::vector<std::vector<int32_t>> dx, dy;
  std::vector<float> angles;
  int num_linear = 0;

  explicit Matcher(const Input& input) : in(input), pyramid(BuildPyramid(input)) {}

  // Per-match precomputation: rotate + discretize the scan for every
  // candidate angle (counted inside the timed region, as in the
  // reference's Match).
  void DiscretizeScans() {
    float max_range_sq = 0;
    for (int i = 0; i < in.n; ++i) {
      float x = in.pts[2 * i], y = in.pts[2 * i + 1];
      max_range_sq = std::max(max_range_sq, x * x + y * y);
    }
    float max_range =
        std::max(std::sqrt(max_range_sq), 3.0f * in.resolution);
    float step = (1.0f - 1e-3f) *
                 std::acos(1.0f - in.resolution * in.resolution /
                                      (2.0f * max_range * max_range));
    int num_angular = (int)std::ceil(in.angular_window / step);
    int num_scans = 2 * num_angular + 1;
    angles.resize(num_scans);
    dx.assign(num_scans, std::vector<int32_t>(in.n));
    dy.assign(num_scans, std::vector<int32_t>(in.n));
    for (int a = 0; a < num_scans; ++a) {
      angles[a] = (a - num_angular) * step;
      float t = in.itheta + angles[a];
      float c = std::cos(t), s = std::sin(t);
      for (int i = 0; i < in.n; ++i) {
        float px = in.pts[2 * i], py = in.pts[2 * i + 1];
        float wx = c * px - s * py + in.ix;
        float wy = s * px + c * py + in.iy;
        dx[a][i] = (int32_t)std::floor((wx - in.ox) / in.resolution);
        dy[a][i] = (int32_t)std::floor((wy - in.oy) / in.resolution);
      }
    }
    num_linear = (int)std::ceil(in.linear_window / in.resolution);
    num_linear = std::min(num_linear, std::max(in.h, in.w) + 1);
  }

  float Score(int level, const Candidate& c) const {
    const auto& pool = pyramid[level];
    const auto& sx = dx[c.angle];
    const auto& sy = dy[c.angle];
    int sum = 0;
    for (int i = 0; i < in.n; ++i) {
      int x = sx[i] + c.x, y = sy[i] + c.y;
      if (x >= 0 && x < in.w && y >= 0 && y < in.h)
        sum += pool[size_t(y) * in.w + x];
      // out-of-grid contributes 0 == MIN_PROBABILITY
    }
    return (float(sum) / in.n) / kU8Scale + kMinProbability;
  }

  void ScoreAndSort(int level, std::vector<Candidate>* cands) const {
    for (auto& c : *cands) c.score = Score(level, c);
    std::sort(cands->begin(), cands->end(),
              [](const Candidate& a, const Candidate& b) {
                return a.score > b.score;
              });
  }

  // DFS branch-and-bound (reference Match semantics): candidates sorted
  // by pooled bound descending; prune when the bound cannot beat the
  // incumbent; leaves update the incumbent.
  float BranchAndBound(const std::vector<Candidate>& cands, int level,
                       float best, Candidate* best_cand) const {
    for (const auto& c : cands) {
      if (c.score <= best) break;  // sorted: nothing further can win
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

  // One full windowed match; returns best score (or min_score if none).
  float Match(Candidate* best_cand) {
    DiscretizeScans();
    int stride = 1 << (in.depth - 1);
    std::vector<Candidate> top;
    for (int a = 0; a < (int)angles.size(); ++a)
      for (int x = -num_linear; x <= num_linear; x += stride)
        for (int y = -num_linear; y <= num_linear; y += stride)
          top.push_back({a, x, y, 0});
    ScoreAndSort(in.depth - 1, &top);
    best_cand->angle = -1;
    return BranchAndBound(top, in.depth - 1, in.min_score, best_cand);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s input.bin\n", argv[0]);
    return 2;
  }
  Input in;
  if (!ReadInput(argv[1], &in)) {
    std::fprintf(stderr, "failed to read %s\n", argv[1]);
    return 1;
  }
  Matcher matcher(in);  // pyramid build = memoized per submap, untimed
  Candidate best{-1, 0, 0, 0};
  float score = 0;
  // Warmup (page in the pyramid).
  score = matcher.Match(&best);
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < in.repeats; ++r) score = matcher.Match(&best);
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  double per = dt / std::max(1, in.repeats);
  float dtheta = best.angle >= 0 ? matcher.angles[best.angle] : 0.0f;
  std::printf(
      "{\"matches_per_sec\": %.2f, \"ms_per_match\": %.3f, "
      "\"score\": %.6f, \"pose\": [%.6f, %.6f, %.6f], \"found\": %s}\n",
      1.0 / per, per * 1e3, score,
      in.ix + best.x * in.resolution, in.iy + best.y * in.resolution,
      in.itheta + dtheta, best.angle >= 0 ? "true" : "false");
  return 0;
}
