// Exact triangle-box (SAT) surface voxelizer for the IoU protocol.
//
// The reference computes IoU on surface-voxel occupancy grids built by
// pymesh.VoxelGrid(2/dim).insert_mesh (reference test/test_iou.py:208-233):
// a cell is occupied iff some triangle geometrically intersects it. The
// sampling voxelizer (disn_tpu/ops/voxelize.py) approximates that by
// area-proportional point sampling, which cannot *guarantee* a grazing
// cell is marked. This implements the exact predicate with the standard
// 13-axis separating-axis test (3 box axes + 1 triangle normal + 9 edge
// cross products), so occupancy is geometric, not stochastic.
//
// Grid convention matches voxelize.voxelize_surface: cell (i,j,k) covers
// [-offset + i*cell, -offset + (i+1)*cell) per axis with cell = span/dim;
// only cells inside [0, dim) are marked. Comparisons are inclusive, so a
// triangle exactly touching a cell face marks both cells (measure-zero
// protocol ambiguity either way).
#include <cmath>
#include <cstdint>

namespace {

inline float min3(float a, float b, float c) {
  float m = a < b ? a : b;
  return m < c ? m : c;
}
inline float max3(float a, float b, float c) {
  float m = a > b ? a : b;
  return m > c ? m : c;
}

// Triangle/origin-centered-cube overlap, half-extent h on every axis.
// v0/v1/v2 are the triangle vertices already translated by -center.
bool tri_cube_overlap(const float v0[3], const float v1[3],
                      const float v2[3], float h) {
  // 1) box-axis tests (triangle AABB vs cube)
  for (int j = 0; j < 3; j++) {
    if (min3(v0[j], v1[j], v2[j]) > h) return false;
    if (max3(v0[j], v1[j], v2[j]) < -h) return false;
  }
  float e[3][3];
  for (int j = 0; j < 3; j++) {
    e[0][j] = v1[j] - v0[j];
    e[1][j] = v2[j] - v1[j];
    e[2][j] = v0[j] - v2[j];
  }
  // 2) nine edge-cross-axis tests: a = unit_j x e_k has components
  //    a[j] = 0, a[j1] = -e[k][j2], a[j2] = e[k][j1] (j1/j2 = other axes)
  for (int k = 0; k < 3; k++) {
    for (int j = 0; j < 3; j++) {
      int j1 = (j + 1) % 3, j2 = (j + 2) % 3;
      float ay = -e[k][j2], az = e[k][j1];
      float p0 = ay * v0[j1] + az * v0[j2];
      float p1 = ay * v1[j1] + az * v1[j2];
      float p2 = ay * v2[j1] + az * v2[j2];
      float rad = h * (std::fabs(ay) + std::fabs(az));
      if (min3(p0, p1, p2) > rad || max3(p0, p1, p2) < -rad) return false;
    }
  }
  // 3) triangle-plane test: |n . v0| <= h * (|nx|+|ny|+|nz|)
  float n[3] = {e[0][1] * e[1][2] - e[0][2] * e[1][1],
                e[0][2] * e[1][0] - e[0][0] * e[1][2],
                e[0][0] * e[1][1] - e[0][1] * e[1][0]};
  float d = n[0] * v0[0] + n[1] * v0[1] + n[2] * v0[2];
  float rad = h * (std::fabs(n[0]) + std::fabs(n[1]) + std::fabs(n[2]));
  return std::fabs(d) <= rad;
}

}  // namespace

extern "C" void voxelize_sat(const float* verts, int64_t nv,
                             const int32_t* faces, int64_t nf,
                             int32_t dim, float offset, float span,
                             uint8_t* occ) {
  (void)nv;
  const double cell = (double)span / (double)dim;
  const float h = (float)(0.5 * cell);
  for (int64_t f = 0; f < nf; f++) {
    const float* t0 = verts + 3 * (int64_t)faces[3 * f + 0];
    const float* t1 = verts + 3 * (int64_t)faces[3 * f + 1];
    const float* t2 = verts + 3 * (int64_t)faces[3 * f + 2];
    int lo[3], hi[3];
    bool off_grid = false;
    for (int j = 0; j < 3; j++) {
      // double-precision index math: a float-rounded boundary must not
      // drop a genuinely-crossed cell from the candidate range
      double lj = (double)min3(t0[j], t1[j], t2[j]) + (double)offset;
      double hj = (double)max3(t0[j], t1[j], t2[j]) + (double)offset;
      lo[j] = (int)std::floor(lj / cell);
      hi[j] = (int)std::floor(hj / cell);
      if (hi[j] < 0 || lo[j] >= dim) off_grid = true;
      if (lo[j] < 0) lo[j] = 0;
      if (hi[j] >= dim) hi[j] = dim - 1;
    }
    if (off_grid) continue;
    if (lo[0] == hi[0] && lo[1] == hi[1] && lo[2] == hi[2]) {
      // triangle entirely inside one cell's AABB: overlap is immediate
      // (the common case at production sizes — mesh edges ~0.008 vs
      // cell ~0.022 at dim=110)
      occ[((int64_t)lo[0] * dim + lo[1]) * dim + lo[2]] = 1;
      continue;
    }
    for (int ix = lo[0]; ix <= hi[0]; ix++) {
      float cx = (float)(-(double)offset + (ix + 0.5) * cell);
      for (int iy = lo[1]; iy <= hi[1]; iy++) {
        float cy = (float)(-(double)offset + (iy + 0.5) * cell);
        for (int iz = lo[2]; iz <= hi[2]; iz++) {
          uint8_t* o = occ + ((int64_t)ix * dim + iy) * dim + iz;
          if (*o) continue;  // already marked: skip the SAT
          float cz = (float)(-(double)offset + (iz + 0.5) * cell);
          float v0[3] = {t0[0] - cx, t0[1] - cy, t0[2] - cz};
          float v1[3] = {t1[0] - cx, t1[1] - cy, t1[2] - cz};
          float v2[3] = {t2[0] - cx, t2[1] - cy, t2[2] - cz};
          if (tri_cube_overlap(v0, v1, v2, h)) *o = 1;
        }
      }
    }
  }
}
