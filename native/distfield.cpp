// Signed distance field generator — native replacement for the prebuilt
// closed-source Vega `computeDistanceField` binary the reference shells out
// to (preprocessing/create_point_sdf_grid.py:200-210, isosurface/).
//
// Algorithm:
//   * unsigned distance: BVH (median-split AABB tree) over triangles,
//     branch-and-bound nearest-triangle query per grid point, multithreaded
//     over z-slabs;
//   * sign: parity ray casting along all three axes with majority vote —
//     robust to the small holes and duplicate faces common in ShapeNet
//     meshes (single-axis parity flips on every crack; three-axis voting
//     suppresses them);
//   * optional narrow band (requires res % 4 == 0, else silently exact):
//     points farther than `band` from the surface (estimated from a coarse
//     pre-pass) keep the coarse distance, matching the reference's banded
//     invocation (-g band).
//
// Exposed as a C API for ctypes (disn_tpu/native.py) and as a CLI:
//   distfield <in.obj> <res> <expand_rate> <out.dist> [sign_votes=3]
//             [threads=0] [band=0]
// writing the same `.dist` byte format as the reference tools
// (3x int32 {-res,res,res}, 6x float64 bbox, float32[(res+1)^3], x fastest).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  float dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  float norm2() const { return dot(*this); }
};

float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

inline Vec3 p_from(int32_t x, int32_t y, int32_t z, double x0, double y0,
                   double z0, double sx, double sy, double sz) {
  return {(float)(x0 + x * sx), (float)(y0 + y * sy), (float)(z0 + z * sz)};
}

// squared distance from point to triangle (Ericson, Real-Time Collision
// Detection §5.1.5 — standard barycentric region walk)
float point_tri_dist2(const Vec3& p, const Vec3& a, const Vec3& b,
                      const Vec3& c) {
  Vec3 ab = b - a, ac = c - a, ap = p - a;
  float d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return ap.norm2();
  Vec3 bp = p - b;
  float d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return bp.norm2();
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    return (ap - ab * v).norm2();
  }
  Vec3 cp = p - c;
  float d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return cp.norm2();
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    return (ap - ac * w).norm2();
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    Vec3 e = c - b;
    return (bp - e * w).norm2();
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  Vec3 q = a + ab * v + ac * w;
  return (p - q).norm2();
}

struct BVHNode {
  Vec3 lo, hi;
  int32_t left = -1, right = -1;  // children, or -1 when leaf
  int32_t start = 0, count = 0;   // triangle range when leaf
};

struct BVH {
  std::vector<BVHNode> nodes;
  std::vector<int32_t> order;          // triangle indices per leaf ranges
  const float* verts = nullptr;        // [n_verts, 3]
  const int32_t* tris = nullptr;       // [n_tris, 3]

  Vec3 vert(int32_t vi) const {
    return {verts[3 * vi], verts[3 * vi + 1], verts[3 * vi + 2]};
  }
  void tri(int32_t t, Vec3& a, Vec3& b, Vec3& c) const {
    a = vert(tris[3 * t]);
    b = vert(tris[3 * t + 1]);
    c = vert(tris[3 * t + 2]);
  }

  void build(const float* v, int32_t nv, const int32_t* f, int32_t nf) {
    verts = v;
    tris = f;
    (void)nv;
    order.resize(nf);
    std::vector<Vec3> centroids(nf);
    for (int32_t i = 0; i < nf; i++) {
      order[i] = i;
      Vec3 a, b, c;
      tri(i, a, b, c);
      centroids[i] = (a + b + c) * (1.0f / 3.0f);
    }
    nodes.reserve(2 * nf / 4 + 2);
    build_node(0, nf, centroids);
  }

  int32_t build_node(int32_t start, int32_t count,
                     const std::vector<Vec3>& centroids) {
    int32_t idx = (int32_t)nodes.size();
    nodes.push_back({});
    Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = start; i < start + count; i++) {
      Vec3 a, b, c;
      tri(order[i], a, b, c);
      for (const Vec3& p : {a, b, c}) {
        lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
        lo.z = std::min(lo.z, p.z);
        hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
        hi.z = std::max(hi.z, p.z);
      }
    }
    nodes[idx].lo = lo;
    nodes[idx].hi = hi;
    if (count <= 4) {
      nodes[idx].start = start;
      nodes[idx].count = count;
      return idx;
    }
    Vec3 ext = hi - lo;
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
    auto key = [&](int32_t t) {
      const Vec3& c = centroids[t];
      return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
    };
    std::nth_element(order.begin() + start, order.begin() + start + count / 2,
                     order.begin() + start + count,
                     [&](int32_t a, int32_t b) { return key(a) < key(b); });
    int32_t mid = count / 2;
    int32_t l = build_node(start, mid, centroids);
    int32_t r = build_node(start + mid, count - mid, centroids);
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  static float box_dist2(const Vec3& p, const Vec3& lo, const Vec3& hi) {
    float dx = std::max({lo.x - p.x, 0.0f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.0f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.0f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }

  float nearest2(const Vec3& p, float best) const {
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int32_t ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (box_dist2(p, n.lo, n.hi) >= best) continue;
      if (n.left < 0) {
        for (int32_t i = n.start; i < n.start + n.count; i++) {
          Vec3 a, b, c;
          tri(order[i], a, b, c);
          best = std::min(best, point_tri_dist2(p, a, b, c));
        }
      } else {
        float dl = box_dist2(p, nodes[n.left].lo, nodes[n.left].hi);
        float dr = box_dist2(p, nodes[n.right].lo, nodes[n.right].hi);
        // visit nearer child first
        if (dl < dr) {
          if (dr < best) stack[sp++] = n.right;
          if (dl < best) stack[sp++] = n.left;
        } else {
          if (dl < best) stack[sp++] = n.left;
          if (dr < best) stack[sp++] = n.right;
        }
      }
    }
    return best;
  }

  // collect axis-ray triangle crossings: ray origin o, direction +axis;
  // appends crossing coordinates (along the axis) to `hits`
  void ray_crossings(const Vec3& o, int axis, std::vector<float>& hits) const {
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      const BVHNode& n = nodes[stack[--sp]];
      // ray-box overlap: the two perpendicular coords must be inside the box
      float u = axis == 0 ? o.y : o.x;
      float v = axis == 2 ? o.y : o.z;
      float blu = axis == 0 ? n.lo.y : n.lo.x;
      float bhu = axis == 0 ? n.hi.y : n.hi.x;
      float blv = axis == 2 ? n.lo.y : n.lo.z;
      float bhv = axis == 2 ? n.hi.y : n.hi.z;
      float bha = axis == 0 ? n.hi.x : (axis == 1 ? n.hi.y : n.hi.z);
      float oa = axis == 0 ? o.x : (axis == 1 ? o.y : o.z);
      if (u < blu || u > bhu || v < blv || v > bhv || oa > bha) continue;
      if (n.left < 0) {
        for (int32_t i = n.start; i < n.start + n.count; i++) {
          Vec3 a, b, c;
          tri(order[i], a, b, c);
          // Möller–Trumbore specialized to an axis ray
          Vec3 d = {axis == 0 ? 1.0f : 0.0f, axis == 1 ? 1.0f : 0.0f,
                    axis == 2 ? 1.0f : 0.0f};
          Vec3 e1 = b - a, e2 = c - a;
          Vec3 pv = d.cross(e2);
          float det = e1.dot(pv);
          if (std::fabs(det) < 1e-12f) continue;
          float inv = 1.0f / det;
          Vec3 tv = o - a;
          float uu = tv.dot(pv) * inv;
          if (uu < 0 || uu > 1) continue;
          Vec3 qv = tv.cross(e1);
          float vv = d.dot(qv) * inv;
          if (vv < 0 || uu + vv > 1) continue;
          float t = e2.dot(qv) * inv;
          if (t > 0) hits.push_back(t);
        }
      } else {
        stack[sp++] = n.left;
        stack[sp++] = n.right;
      }
    }
  }
};

}  // namespace

extern "C" {

// Computes the signed distance field on a (res+1)^3 grid over bbox
// [lo, hi]^3 (x fastest). sign_votes in {1,3}: number of axes used for the
// inside/outside parity vote. band > 0 enables the narrow-band mode matching
// the reference Vega invocation (-g band, create_point_sdf_grid.py:200-207):
// distances farther than `band` from the surface are coarse-grid
// interpolations (magnitude only; signs stay exact from the parity votes) —
// the consumers (stratified band sampling, iso~0.003 marching cubes) never
// read exact values there. Returns 0 on success.
int compute_distance_field(const float* verts, int32_t n_verts,
                           const int32_t* tris, int32_t n_tris, int32_t res,
                           const double* bbox,  // x0 y0 z0 x1 y1 z1
                           float* out,          // [(res+1)^3]
                           int32_t sign_votes, int32_t n_threads,
                           double band) {
  if (n_tris <= 0 || res <= 0) return 1;
  BVH bvh;
  bvh.build(verts, n_verts, tris, n_tris);
  const int32_t R = res + 1;
  const double x0 = bbox[0], y0 = bbox[1], z0 = bbox[2];
  const double sx = (bbox[3] - x0) / res, sy = (bbox[4] - y0) / res,
               sz = (bbox[5] - z0) / res;

  // inside flags via parity voting
  std::vector<uint8_t> votes((size_t)R * R * R, 0);
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, 64));

  auto parity_axis = [&](int axis) {
    // rays along `axis` from below the bbox, one per perpendicular grid line
    std::atomic<int32_t> next(0);
    auto work = [&]() {
      std::vector<float> hits;
      int32_t line;
      while ((line = next.fetch_add(1)) < R * R) {
        int32_t i = line % R, j = line / R;  // perpendicular coords
        // jitter the ray off grid-aligned planes: extracted-mesh vertices lie
        // exactly on them, and exact edge/vertex hits double-count crossings
        const double ju = 0.0337731, jv = 0.0571123;  // fractions of a cell
        Vec3 o;
        float base;
        if (axis == 0) {        // x ray at (y~i, z~j)
          o = {(float)(x0 - sx), (float)(y0 + (i + ju) * sy),
               (float)(z0 + (j + jv) * sz)};
          base = (float)(x0 - sx);
        } else if (axis == 1) { // y ray at (x~i, z~j)
          o = {(float)(x0 + (i + ju) * sx), (float)(y0 - sy),
               (float)(z0 + (j + jv) * sz)};
          base = (float)(y0 - sy);
        } else {                // z ray at (x~i, y~j)
          o = {(float)(x0 + (i + ju) * sx), (float)(y0 + (j + jv) * sy),
               (float)(z0 - sz)};
          base = (float)(z0 - sz);
        }
        hits.clear();
        bvh.ray_crossings(o, axis, hits);
        std::sort(hits.begin(), hits.end());
        // walk the grid line, counting crossings passed
        size_t h = 0;
        for (int32_t k = 0; k < R; k++) {
          double coord = (axis == 0 ? x0 + k * sx
                          : axis == 1 ? y0 + k * sy : z0 + k * sz);
          float tk = (float)(coord - base);
          while (h < hits.size() && hits[h] <= tk) h++;
          if (h & 1) {
            size_t idx = axis == 0
                ? ((size_t)j * R + i) * R + k
                : axis == 1 ? ((size_t)j * R + k) * R + i
                            : ((size_t)k * R + j) * R + i;
            votes[idx]++;
          }
        }
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  };

  int axes = sign_votes >= 3 ? 3 : 1;
  for (int a = 0; a < axes; a++) parity_axis(a);
  uint8_t need = axes >= 3 ? 2 : 1;  // majority

  // optional coarse pre-pass for narrow-band mode: exact distances on every
  // stride-th grid point; far fine points interpolate it
  const int32_t stride = 4;
  std::vector<float> coarse;
  int32_t Rc = 0;
  bool banded = band > 0 && res % stride == 0;
  if (banded) {
    Rc = res / stride + 1;
    coarse.resize((size_t)Rc * Rc * Rc);
    std::atomic<int32_t> next(0);
    auto cwork = [&]() {
      int32_t z;
      while ((z = next.fetch_add(1)) < Rc) {
        for (int32_t y = 0; y < Rc; y++) {
          float best = 1e30f;
          for (int32_t x = 0; x < Rc; x++) {
            Vec3 p = {(float)(x0 + (double)x * stride * sx),
                      (float)(y0 + (double)y * stride * sy),
                      (float)(z0 + (double)z * stride * sz)};
            float cap = best > 1e29f
                ? 1e30f : (std::sqrt(best) + (float)(stride * sx) + 1e-6f);
            best = bvh.nearest2(p, cap > 1e29f ? 1e30f : cap * cap);
            coarse[((size_t)z * Rc + y) * Rc + x] = std::sqrt(best);
          }
        }
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(cwork);
    for (auto& t : pool) t.join();
  }
  const float margin =            // coarse cell diagonal (anisotropic bbox)
      (float)(stride * std::sqrt(sx * sx + sy * sy + sz * sz));

  auto coarse_interp = [&](int32_t x, int32_t y, int32_t z) -> float {
    // trilinear over the coarse cell containing fine point (x, y, z)
    int32_t cx = std::min(x / stride, Rc - 2), cy = std::min(y / stride, Rc - 2),
            cz = std::min(z / stride, Rc - 2);
    float fx = (float)(x - cx * stride) / stride;
    float fy = (float)(y - cy * stride) / stride;
    float fz = (float)(z - cz * stride) / stride;
    auto at = [&](int32_t dz, int32_t dy, int32_t dx) {
      return coarse[((size_t)(cz + dz) * Rc + cy + dy) * Rc + cx + dx];
    };
    float c00 = at(0, 0, 0) * (1 - fx) + at(0, 0, 1) * fx;
    float c01 = at(0, 1, 0) * (1 - fx) + at(0, 1, 1) * fx;
    float c10 = at(1, 0, 0) * (1 - fx) + at(1, 0, 1) * fx;
    float c11 = at(1, 1, 0) * (1 - fx) + at(1, 1, 1) * fx;
    float c0 = c00 * (1 - fy) + c01 * fy;
    float c1 = c10 * (1 - fy) + c11 * fy;
    return c0 * (1 - fz) + c1 * fz;
  };

  // distances, multithreaded over z-slabs
  {
    std::atomic<int32_t> next(0);
    auto work = [&]() {
      int32_t z;
      while ((z = next.fetch_add(1)) < R) {
        for (int32_t y = 0; y < R; y++) {
          float best = 1e30f;  // warm start: previous cell's best + step
          for (int32_t x = 0; x < R; x++) {
            size_t idx = ((size_t)z * R + y) * R + x;
            float d;
            float approx = banded ? coarse_interp(x, y, z) : 0.0f;
            if (banded && approx - margin > (float)band) {
              d = approx;  // provably outside the band: keep the interp
              best = 1e30f;
            } else {
              float cap = best > 1e29f
                  ? 1e30f : (std::sqrt(best) + (float)sx + 1e-6f);
              best = bvh.nearest2(p_from(x, y, z, x0, y0, z0, sx, sy, sz),
                                  cap > 1e29f ? 1e30f : cap * cap);
              d = std::sqrt(best);
            }
            out[idx] = votes[idx] >= need ? -d : d;
          }
        }
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CLI
// ---------------------------------------------------------------------------

static bool load_obj(const char* path, std::vector<float>& verts,
                     std::vector<int32_t>& tris) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.size() < 2) continue;
    if (line[0] == 'v' && line[1] == ' ') {
      float x, y, z;
      if (sscanf(line.c_str() + 2, "%f %f %f", &x, &y, &z) == 3) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      std::istringstream ss(line.substr(2));
      std::vector<int32_t> idx;
      std::string tok;
      int32_t nv = (int32_t)(verts.size() / 3);
      bool ok = true;
      while (ss >> tok) {
        long raw = std::strtol(tok.c_str(), nullptr, 10);
        // OBJ negative indices are relative to the vertices defined so far
        int32_t v = raw < 0 ? (int32_t)(nv + raw) : (int32_t)(raw - 1);
        if (v < 0 || v >= nv) ok = false;
        idx.push_back(v);
      }
      if (!ok) continue;  // skip malformed faces rather than read OOB
      for (size_t i = 1; i + 1 < idx.size(); i++) {
        tris.push_back(idx[0]);
        tris.push_back(idx[i]);
        tris.push_back(idx[i + 1]);
      }
    }
  }
  return !verts.empty() && !tris.empty();
}

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <in.obj> <res> <expand_rate> <out.dist> "
                 "[sign_votes=3] [threads=0] [band=0]\n",
                 argv[0]);
    return 2;
  }
  std::vector<float> verts;
  std::vector<int32_t> tris;
  if (!load_obj(argv[1], verts, tris)) {
    std::fprintf(stderr, "failed to load %s\n", argv[1]);
    return 1;
  }
  int res = std::atoi(argv[2]);
  double expand = std::atof(argv[3]);
  int votes = argc > 5 ? std::atoi(argv[5]) : 3;
  int threads = argc > 6 ? std::atoi(argv[6]) : 0;
  double band = argc > 7 ? std::atof(argv[7]) : 0.0;

  // bbox: symmetric cube around the mesh extent, expanded (the reference
  // expands the unit-normalized mesh bbox by expand_rate,
  // create_point_sdf_grid.py:200-210)
  float m = 0;
  for (size_t i = 0; i < verts.size(); i++) m = std::max(m, std::fabs(verts[i]));
  double half = m * expand;
  double bbox[6] = {-half, -half, -half, half, half, half};

  std::vector<float> out((size_t)(res + 1) * (res + 1) * (res + 1));
  if (compute_distance_field(verts.data(), (int32_t)(verts.size() / 3),
                             tris.data(), (int32_t)(tris.size() / 3), res,
                             bbox, out.data(), votes, threads, band)) {
    return 1;
  }
  std::ofstream o(argv[4], std::ios::binary);
  int32_t hdr[3] = {-res, res, res};
  o.write((char*)hdr, 12);
  o.write((char*)bbox, 48);
  o.write((char*)out.data(), out.size() * 4);
  return 0;
}
