// Host-side seed-shell generator.
//
// Native counterpart of sapcu_tpu.ops.seeds (the production path is the
// JAX/TPU kernel; this tool serves hosts without an accelerator and keeps
// the reference's file contract for drop-in use):
//
//   ./seed_gen <cell> <npoints>       # reads ./test.xyz, writes ./target.xyz
//
// Also built as a shared library exposing seed_generate() for ctypes.
//
// Semantics (matching sapcu_tpu/ops/seeds.py, which is golden-tested
// against the reference `dense` binary): voxel grid of boxsize=round(1/cell)
// spanning [-0.5, 0.5]^3; BFS from the input-point voxels through voxels
// whose distance to the local surface approximation is <= band_hi; the
// surface approximation at a voxel center is 8 triangles spanned by its
// 10 nearest input points (j-th nearest for j=3..10, 2nd nearest, nearest);
// emit visited voxel centers with distance in [band_lo, band_hi].
//
// Fresh implementation: flat vector kd-tree with iterative traversal,
// 64-bit voxel keys (no index-wrap at grid edges), no input-size caps.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <queue>
#include <unordered_set>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double sqnorm(V3 a) { return dot(a, a); }

// Closest point on triangle (a,b,c) to p — Voronoi-region walk.
V3 closest_on_tri(V3 a, V3 b, V3 c, V3 p) {
  V3 ab = b - a, ac = c - a, bc = c - b;
  double snom = dot(p - a, ab), sdenom = dot(p - b, a - b);
  double tnom = dot(p - a, ac), tdenom = dot(p - c, a - c);
  if (snom <= 0.0 && tnom <= 0.0) return a;
  double unom = dot(p - b, bc), udenom = dot(p - c, b - c);
  if (sdenom <= 0.0 && unom <= 0.0) return b;
  if (tdenom <= 0.0 && udenom <= 0.0) return c;
  V3 n = cross(ab, ac);
  double vc = dot(n, cross(a - p, b - p));
  if (vc <= 0.0 && snom >= 0.0 && sdenom >= 0.0)
    return a + ab * (snom / (snom + sdenom));
  double va = dot(n, cross(b - p, c - p));
  if (va <= 0.0 && unom >= 0.0 && udenom >= 0.0)
    return b + bc * (unom / (unom + udenom));
  double vb = dot(n, cross(c - p, a - p));
  if (vb <= 0.0 && tnom >= 0.0 && tdenom >= 0.0)
    return a + ac * (tnom / (tnom + tdenom));
  double u = va / (va + vb + vc), v = vb / (va + vb + vc);
  return a * u + b * v + c * (1.0 - u - v);
}

// Median-split kd-tree over a copy of the points, iterative kNN query.
class KdTree {
 public:
  explicit KdTree(std::vector<V3> pts) : pts_(std::move(pts)) {
    idx_.resize(pts_.size());
    for (size_t i = 0; i < idx_.size(); ++i) idx_[i] = static_cast<int>(i);
    nodes_.reserve(2 * pts_.size());
    root_ = build(0, static_cast<int>(pts_.size()), 0);
  }

  // k nearest points to q, ascending by distance.
  void query(V3 q, int k, std::vector<V3>* out) const {
    // max-heap of (dist2, point index)
    std::priority_queue<std::pair<double, int>> heap;
    search(root_, q, k, &heap);
    out->resize(heap.size());
    for (int i = static_cast<int>(heap.size()) - 1; !heap.empty(); --i) {
      (*out)[i] = pts_[heap.top().second];
      heap.pop();
    }
  }

 private:
  struct Node {
    int point;        // index into pts_
    int left, right;  // node ids or -1
    int axis;
  };

  int build(int lo, int hi, int depth) {
    if (lo >= hi) return -1;
    int axis = depth % 3;
    int mid = (lo + hi) / 2;
    std::nth_element(idx_.begin() + lo, idx_.begin() + mid, idx_.begin() + hi,
                     [&](int a, int b) { return coord(a, axis) < coord(b, axis); });
    Node n{idx_[mid], -1, -1, axis};
    int id = static_cast<int>(nodes_.size());
    nodes_.push_back(n);
    nodes_[id].left = build(lo, mid, depth + 1);
    nodes_[id].right = build(mid + 1, hi, depth + 1);
    return id;
  }

  double coord(int point, int axis) const {
    const V3& p = pts_[point];
    return axis == 0 ? p.x : axis == 1 ? p.y : p.z;
  }

  void search(int node, V3 q, int k,
              std::priority_queue<std::pair<double, int>>* heap) const {
    if (node < 0) return;
    const Node& n = nodes_[node];
    double d2 = sqnorm(pts_[n.point] - q);
    if (static_cast<int>(heap->size()) < k)
      heap->push({d2, n.point});
    else if (d2 < heap->top().first) {
      heap->pop();
      heap->push({d2, n.point});
    }
    double qd = (n.axis == 0 ? q.x : n.axis == 1 ? q.y : q.z) -
                coord(n.point, n.axis);
    int near = qd < 0 ? n.left : n.right;
    int far = qd < 0 ? n.right : n.left;
    search(near, q, k, heap);
    if (static_cast<int>(heap->size()) < k || qd * qd < heap->top().first)
      search(far, q, k, heap);
  }

  std::vector<V3> pts_;
  std::vector<int> idx_;
  std::vector<Node> nodes_;
  int root_;
};

double band_distance(const KdTree& tree, V3 center) {
  std::vector<V3> nn;
  tree.query(center, 10, &nn);
  if (nn.size() < 3) return 1e30;
  const V3 nearest = nn[0], second = nn[1];
  double best = 1e30;
  for (size_t j = 2; j < nn.size(); ++j) {
    V3 cp = closest_on_tri(nn[j], second, nearest, center);
    best = std::min(best, sqnorm(cp - center));
  }
  return std::sqrt(best);
}

}  // namespace

extern "C" {

// points: n*3 doubles in [-0.5, 0.5]^3. out: capacity max_out*3 doubles.
// Returns the number of seed centers written (or the total needed if it
// exceeds max_out; callers should retry with a larger buffer).
long seed_generate(const double* points, long n, double cell,
                   double band_lo, double band_hi, double* out,
                   long max_out) {
  const long bs = static_cast<long>(std::lround(1.0 / cell));
  std::vector<V3> pts(n);
  for (long i = 0; i < n; ++i)
    pts[i] = {points[3 * i], points[3 * i + 1], points[3 * i + 2]};
  KdTree tree(pts);

  auto key = [bs](long x, long y, long z) -> int64_t {
    return (static_cast<int64_t>(x) * bs + y) * bs + z;
  };
  auto voxel_of = [&](double v) {
    long i = static_cast<long>(std::floor((v + 0.5) / cell));
    return std::min(std::max(i, 0L), bs - 1);  // clamp (vs reference UB)
  };

  std::queue<int64_t> frontier;
  std::unordered_set<int64_t> visited;
  for (const V3& p : pts)
    frontier.push(key(voxel_of(p.x), voxel_of(p.y), voxel_of(p.z)));

  const long steps[6][3] = {{1, 0, 0}, {-1, 0, 0}, {0, 1, 0},
                            {0, -1, 0}, {0, 0, 1}, {0, 0, -1}};
  long count = 0;
  while (!frontier.empty()) {
    int64_t id = frontier.front();
    frontier.pop();
    if (!visited.insert(id).second) continue;
    long z = id % bs, y = (id / bs) % bs, x = id / (bs * bs);
    V3 center{x * cell + 0.5 * cell - 0.5, y * cell + 0.5 * cell - 0.5,
              z * cell + 0.5 * cell - 0.5};
    double d = band_distance(tree, center);
    if (d >= band_lo && d <= band_hi) {
      if (count < max_out) {
        out[3 * count] = center.x;
        out[3 * count + 1] = center.y;
        out[3 * count + 2] = center.z;
      }
      ++count;
    }
    if (d > band_hi) continue;  // do not expand past the band
    for (const auto& s : steps) {
      long tx = x + s[0], ty = y + s[1], tz = z + s[2];
      if (tx < 0 || ty < 0 || tz < 0 || tx >= bs || ty >= bs || tz >= bs)
        continue;  // no index wrap at edges (vs reference quirk)
      int64_t nid = key(tx, ty, tz);
      if (!visited.count(nid)) frontier.push(nid);
    }
  }
  return count;
}

}  // extern "C"

#ifndef SEED_GEN_NO_MAIN
int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <cell> <npoints>\n", argv[0]);
    return 1;
  }
  double cell = std::atof(argv[1]);
  long n = std::atol(argv[2]);

  std::FILE* in = std::fopen("test.xyz", "r");
  if (!in) {
    std::fprintf(stderr, "cannot open test.xyz\n");
    return 1;
  }
  std::vector<double> pts(3 * n);
  for (long i = 0; i < n; ++i)
    if (std::fscanf(in, "%lf %lf %lf", &pts[3 * i], &pts[3 * i + 1],
                    &pts[3 * i + 2]) != 3) {
      std::fprintf(stderr, "short read at point %ld\n", i);
      std::fclose(in);
      return 1;
    }
  std::fclose(in);

  std::vector<double> out;
  long cap = 1 << 20;
  out.resize(3 * cap);
  long cnt = seed_generate(pts.data(), n, cell, 0.0110, 0.0150, out.data(), cap);
  if (cnt > cap) {
    out.resize(3 * cnt);
    cnt = seed_generate(pts.data(), n, cell, 0.0110, 0.0150, out.data(), cnt);
  }

  std::FILE* f = std::fopen("target.xyz", "w");
  for (long i = 0; i < cnt; ++i)
    std::fprintf(f, "%lf %lf %lf\n", out[3 * i], out[3 * i + 1],
                 out[3 * i + 2]);
  std::fclose(f);
  return 0;
}
#endif
