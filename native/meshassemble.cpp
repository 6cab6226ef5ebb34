// Owned-edge mesh assembly from device-emitted slot records.
//
// The TPU extraction pass (disn_tpu/ops/marching.py::_extract_records) emits
// per active cell: the 8-corner inside mask, the crossing-direction mask
// (alias-suppressed), and each crossing edge's interpolation parameter as
// u16 fixed point. This function rebuilds the welded (verts, faces) arrays
// the device two-pass extractor would have produced — identical vertex order
// (slot-major, direction-minor) and identical table-driven triangles — at
// host memory speed, so the device never runs face compaction scatters and
// the transfer carries ~1.8 MB of records instead of ~4.3 MB of mesh.
//
// Owner lookups exploit the device compaction's order: ids arrive sorted by
// (4^3 block, local cell) — a block-range index over the (cgrid+1)^3 block
// grid gives O(1) + a <=64-entry binary search per lookup, and the 8
// possible owner cells of each cell are resolved once and reused across its
// up-to-36 triangle vertices. (The first version did a global std::sort +
// 17-step binary search per vertex: 65 ms for 70k cells on the single-core
// eval host; this one measures ~4x faster.)
//
// Replaces nothing in the reference (its marching cubes is the closed-source
// Vega binary, test/create_sdf.py:319-323); this is the TPU-native split of
// that work between device and host.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success, -1 on a missing neighbor owner (corrupt input).
// out_counts[0] = nv, out_counts[1] = ntri. Caller sizes out_verts for
// n_cells*D vertices and out_faces for n_cells*12 triangles (worst case).
int mesh_assemble(const int32_t* ids, const uint32_t* recs,
                  const uint16_t* tq, int32_t n_cells, int32_t R, int32_t D,
                  const int32_t* pair_i, const int32_t* pair_j,
                  const int32_t* corners,     // [8*3] (x,y,z)
                  const int32_t* tets,        // [6*4]
                  const int32_t* counts_tbl,  // [6*16]
                  const int32_t* nb_tbl,      // [6*16*2*3]
                  const int32_t* dir_tbl,     // [6*16*2*3]
                  const float* bbox,          // [6] lo xyz, hi xyz
                  float* out_verts, int32_t* out_faces, int64_t* out_counts) {
  const int64_t E = R;
  const double lo[3] = {bbox[0], bbox[1], bbox[2]};
  const double span[3] = {bbox[3] - bbox[0], bbox[4] - bbox[1],
                          bbox[5] - bbox[2]};
  const double inv = 1.0 / (R - 1);
  const int S = 4;  // block edge == the device scan's group size
  const int64_t B3 = (E + S - 1) / S;  // blocks per axis (covers ghosts)

  // vertex pass: prefix offsets + positions, slot-major/direction-minor
  std::vector<int64_t> vstart(n_cells + 1);
  int64_t nv = 0;
  for (int32_t i = 0; i < n_cells; ++i) {
    vstart[i] = nv;
    const int64_t cid = ids[i];
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    const uint32_t cross = recs[i] >> 8;
    for (int d = 0; d < D; ++d) {
      if (!(cross >> d & 1u)) continue;
      const int32_t* oi = corners + 3 * pair_i[d];
      const int32_t* oj = corners + 3 * pair_j[d];
      const double t = tq[(int64_t)i * D + d] * (1.0 / 65535.0);
      const int64_t gi[3] = {std::min(cx + oi[0], E - 1),
                             std::min(cy + oi[1], E - 1),
                             std::min(cz + oi[2], E - 1)};
      const int64_t gj[3] = {std::min(cx + oj[0], E - 1),
                             std::min(cy + oj[1], E - 1),
                             std::min(cz + oj[2], E - 1)};
      for (int a = 0; a < 3; ++a) {
        const double pi = lo[a] + gi[a] * inv * span[a];
        const double pj = lo[a] + gj[a] * inv * span[a];
        out_verts[nv * 3 + a] = (float)(pi + t * (pj - pi));
      }
      ++nv;
    }
  }
  vstart[n_cells] = nv;

  // block-range index: ids are (block-ascending, local-ascending) by
  // construction of the device compaction; one sweep records each block's
  // slot range
  auto block_of = [&](int64_t cid) -> int64_t {
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    return ((cz / S) * B3 + (cy / S)) * B3 + (cx / S);
  };
  std::vector<int32_t> bstart(B3 * B3 * B3 + 1);
  {
    int64_t prev = -1;
    for (int32_t i = 0; i < n_cells; ++i) {
      const int64_t b = block_of(ids[i]);
      if (b < prev) return -2;  // order contract violated
      for (int64_t k = prev + 1; k <= b; ++k) bstart[k] = i;
      prev = b;
    }
    for (int64_t k = prev + 1; k <= B3 * B3 * B3; ++k) bstart[k] = n_cells;
  }
  auto find_slot = [&](int64_t cid) -> int32_t {
    const int64_t b = block_of(cid);
    const int32_t* first = ids + bstart[b];
    const int32_t* last = ids + bstart[b + 1];
    const int32_t* it = std::lower_bound(first, last, (int32_t)cid);
    if (it == last || *it != cid) return -1;
    return (int32_t)(it - ids);
  };

  // face pass: table-driven, same winding as the device extractor; the 8
  // candidate owner cells resolve once per cell
  int64_t ntri = 0;
  int32_t nslot[8];
  for (int32_t i = 0; i < n_cells; ++i) {
    const int64_t cid = ids[i];
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    if (cx > R - 2 || cy > R - 2 || cz > R - 2) continue;  // ghost cell
    const uint32_t inside = recs[i] & 0xffu;
    for (int c8 = 0; c8 < 8; ++c8) nslot[c8] = -2;  // lazy
    for (int t = 0; t < 6; ++t) {
      int caze = 0;
      for (int j = 0; j < 4; ++j) caze |= (inside >> tets[t * 4 + j] & 1u) << j;
      const int nt = counts_tbl[t * 16 + caze];
      for (int k = 0; k < nt; ++k) {
        for (int v = 0; v < 3; ++v) {
          const int64_t e = (((int64_t)t * 16 + caze) * 2 + k) * 3 + v;
          const int nbc = nb_tbl[e];
          int32_t s = nslot[nbc];
          if (s == -2) {
            if (nbc == 0) {
              s = i;  // offset (0,0,0): the cell itself
            } else {
              const int32_t* off = corners + 3 * nbc;
              s = find_slot(((cz + off[2]) * E + (cy + off[1])) * E
                            + (cx + off[0]));
            }
            nslot[nbc] = s;
          }
          if (s < 0) return -1;
          const int drc = dir_tbl[e];
          const uint32_t cmask = recs[s] >> 8;
          const int rank = __builtin_popcount(cmask & ((1u << drc) - 1u));
          out_faces[ntri * 3 + v] = (int32_t)(vstart[s] + rank);
        }
        ++ntri;
      }
    }
  }
  out_counts[0] = nv;
  out_counts[1] = ntri;
  return 0;
}

// ---- two-phase variant for fetch-overlapped assembly (round 3) ----
//
// The tunnel delivers the record streams in size order: the block bitmask
// stream (~130 KB) and rec stream (~165 KB) land well before the tq stream
// (~570 KB). Splitting assembly lets the faces pass (which needs only
// ids+recs) run while tq is still in flight; the verts pass (the only tq
// consumer) runs last. The ids themselves are reconstructed from the scan's
// block list + 64-bit change masks (ops/marching._active_cells_from_coarse
// bitpack) instead of riding their own 4-byte-per-cell stream.

// Expand (block id, 64-bit mask) pairs into the flat cell-id list the
// device compaction would emit (block-ascending, bit/local-offset
// ascending). Masked-out blocks have zero masks. Returns n_cells.
int64_t mesh_expand_ids(const int32_t* bids, const uint32_t* mlo,
                        const uint32_t* mhi, int32_t n_blocks, int32_t R,
                        int32_t S, int32_t* out_ids) {
  const int64_t E = R;
  const int64_t B3 = (E + S - 1) / S;
  const int s2 = S * S;
  int64_t n = 0;
  for (int32_t b = 0; b < n_blocks; ++b) {
    const uint64_t m = (uint64_t)mlo[b] | ((uint64_t)mhi[b] << 32);
    if (!m) continue;
    const int64_t bid = bids[b];
    const int64_t bz = bid / (B3 * B3), by = (bid / B3) % B3, bx = bid % B3;
    const int64_t base = ((bz * S) * E + by * S) * E + bx * S;
    for (uint64_t mm = m; mm; mm &= mm - 1) {
      const int l = __builtin_ctzll(mm);
      const int64_t lz = l / s2, ly = (l / S) % S, lx = l % S;
      out_ids[n++] = (int32_t)(base + (lz * E + ly) * E + lx);
    }
  }
  return n;
}

// Faces pass only: vstart prefix (from rec crossing popcounts), block-range
// owner index, table-driven triangles. No tq needed. Returns ntri (or
// -1/-2 on corrupt input, as mesh_assemble).
int64_t mesh_faces(const int32_t* ids, const uint32_t* recs, int32_t n_cells,
                   int32_t R, int32_t D, const int32_t* corners,
                   const int32_t* tets, const int32_t* counts_tbl,
                   const int32_t* nb_tbl, const int32_t* dir_tbl,
                   int32_t* out_faces) {
  const int64_t E = R;
  const int S = 4;
  const int64_t B3 = (E + S - 1) / S;
  std::vector<int64_t> vstart(n_cells + 1);
  int64_t nv = 0;
  for (int32_t i = 0; i < n_cells; ++i) {
    vstart[i] = nv;
    nv += __builtin_popcount(recs[i] >> 8);
  }
  vstart[n_cells] = nv;
  auto block_of = [&](int64_t cid) -> int64_t {
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    return ((cz / S) * B3 + (cy / S)) * B3 + (cx / S);
  };
  std::vector<int32_t> bstart(B3 * B3 * B3 + 1);
  {
    int64_t prev = -1;
    for (int32_t i = 0; i < n_cells; ++i) {
      const int64_t b = block_of(ids[i]);
      if (b < prev) return -2;
      for (int64_t k = prev + 1; k <= b; ++k) bstart[k] = i;
      prev = b;
    }
    for (int64_t k = prev + 1; k <= B3 * B3 * B3; ++k) bstart[k] = n_cells;
  }
  auto find_slot = [&](int64_t cid) -> int32_t {
    const int64_t b = block_of(cid);
    const int32_t* first = ids + bstart[b];
    const int32_t* last = ids + bstart[b + 1];
    const int32_t* it = std::lower_bound(first, last, (int32_t)cid);
    if (it == last || *it != cid) return -1;
    return (int32_t)(it - ids);
  };
  int64_t ntri = 0;
  int32_t nslot[8];
  for (int32_t i = 0; i < n_cells; ++i) {
    const int64_t cid = ids[i];
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    if (cx > R - 2 || cy > R - 2 || cz > R - 2) continue;
    const uint32_t inside = recs[i] & 0xffu;
    for (int c8 = 0; c8 < 8; ++c8) nslot[c8] = -2;
    for (int t = 0; t < 6; ++t) {
      int caze = 0;
      for (int j = 0; j < 4; ++j) caze |= (inside >> tets[t * 4 + j] & 1u) << j;
      const int nt = counts_tbl[t * 16 + caze];
      for (int k = 0; k < nt; ++k) {
        for (int v = 0; v < 3; ++v) {
          const int64_t e = (((int64_t)t * 16 + caze) * 2 + k) * 3 + v;
          const int nbc = nb_tbl[e];
          int32_t s = nslot[nbc];
          if (s == -2) {
            if (nbc == 0) {
              s = i;
            } else {
              const int32_t* off = corners + 3 * nbc;
              s = find_slot(((cz + off[2]) * E + (cy + off[1])) * E
                            + (cx + off[0]));
            }
            nslot[nbc] = s;
          }
          if (s < 0) return -1;
          const int drc = dir_tbl[e];
          const uint32_t cmask = recs[s] >> 8;
          const int rank = __builtin_popcount(cmask & ((1u << drc) - 1u));
          out_faces[ntri * 3 + v] = (int32_t)(vstart[s] + rank);
        }
        ++ntri;
      }
    }
  }
  return ntri;
}

// Faces pass driven DIRECTLY by the scan's (block id, 64-bit mask) rows:
// a cell's neighbors resolve by popcount arithmetic on the masks instead
// of per-vertex binary search over the id list — the mask already encodes
// which cells of a 4^3 block exist and in what slot order, so an in-block
// neighbor (the common case) is popcount(mask & below-bit) + the block's
// slot base, and a cross-block neighbor reuses a per-block cache of the
// <=7 adjacent rows (binary search per BLOCK, not per vertex). The id
// list is not needed at all. Also hoists the tet-case computation into a
// [6][256] per-call LUT. Measured ~2.6x over mesh_faces at 70k cells /
// 351k tris on the single-core eval host. Returns ntri, or -1 (missing
// neighbor) / -2 (block order violated) on corrupt input.
int64_t mesh_faces_blocks(const int32_t* bids, const uint32_t* mlo,
                          const uint32_t* mhi, int32_t n_blocks,
                          const uint32_t* recs, int32_t n_cells, int32_t R,
                          int32_t D, const int32_t* corners,
                          const int32_t* tets, const int32_t* counts_tbl,
                          const int32_t* nb_tbl, const int32_t* dir_tbl,
                          int32_t* out_faces) {
  const int64_t E = R;
  const int S = 4, s2 = 16;
  const int64_t B3 = (E + S - 1) / S;

  // compact the nonzero rows: ascending bid -> (bid, slot base, mask)
  std::vector<int32_t> cbid;
  std::vector<int32_t> cbase;
  std::vector<uint64_t> cmask64;
  cbid.reserve(n_blocks);
  cbase.reserve(n_blocks);
  cmask64.reserve(n_blocks);
  {
    int64_t base = 0, prev = -1;
    for (int32_t b = 0; b < n_blocks; ++b) {
      const uint64_t m = (uint64_t)mlo[b] | ((uint64_t)mhi[b] << 32);
      if (!m) continue;
      if (bids[b] <= prev) return -2;
      prev = bids[b];
      cbid.push_back(bids[b]);
      cbase.push_back((int32_t)base);
      cmask64.push_back(m);
      base += __builtin_popcountll(m);
    }
    if (base != n_cells) return -2;
  }
  const int32_t nb_rows = (int32_t)cbid.size();
  auto find_row = [&](int64_t bid) -> int32_t {
    auto it = std::lower_bound(cbid.begin(), cbid.end(), (int32_t)bid);
    if (it == cbid.end() || *it != (int32_t)bid) return -1;
    return (int32_t)(it - cbid.begin());
  };

  // per-call tet-case LUT: caze_lut[t][inside8]
  uint8_t caze_lut[6][256];
  for (int t = 0; t < 6; ++t)
    for (int m = 0; m < 256; ++m) {
      int caze = 0;
      for (int j = 0; j < 4; ++j) caze |= (m >> tets[t * 4 + j] & 1) << j;
      caze_lut[t][m] = (uint8_t)caze;
    }

  // per-cell packed vertex index base: low 28b = 7 rank nibbles (prefix
  // popcount of the crossing mask per direction), high bits = vstart —
  // each triangle vertex then costs ONE u64 load + shift/add instead of
  // two loads (recs, vstart) + a masked popcount
  std::vector<uint64_t> pv(n_cells);
  {
    int64_t nv = 0;
    for (int32_t i = 0; i < n_cells; ++i) {
      const uint32_t cm = recs[i] >> 8;
      uint64_t nib = 0;
      int rank = 0;
      for (int d = 0; d < D; ++d) {
        nib |= (uint64_t)rank << (4 * d);
        rank += cm >> d & 1u;
      }
      pv[i] = ((uint64_t)nv << 28) | nib;
      nv += rank;
    }
  }

  int64_t ntri = 0;
  int32_t adj[8];    // row cache for the 2x2x2 block neighborhood
  int32_t nslot[8];  // per-cell corner-offset slot cache (lazy)
  for (int32_t row = 0, i = 0; row < nb_rows; ++row) {
    const int64_t bid = cbid[row];
    const int64_t bz = bid / (B3 * B3), by = (bid / B3) % B3, bx = bid % B3;
    const int64_t gx0 = bx * S, gy0 = by * S, gz0 = bz * S;
    for (int k8 = 0; k8 < 8; ++k8) adj[k8] = -2;
    adj[0] = row;
    for (uint64_t mm = cmask64[row]; mm; mm &= mm - 1, ++i) {
      const int l = __builtin_ctzll(mm);
      const int lz = l / s2, ly = (l / S) % S, lx = l % S;
      const int64_t cx = gx0 + lx, cy = gy0 + ly, cz = gz0 + lz;
      if (cx > R - 2 || cy > R - 2 || cz > R - 2) continue;  // ghost cell
      const uint32_t inside = recs[i] & 0xffu;
      for (int c8 = 0; c8 < 8; ++c8) nslot[c8] = -3;
      nslot[0] = i;
      for (int t = 0; t < 6; ++t) {
        const int caze = caze_lut[t][inside];
        const int nt = counts_tbl[t * 16 + caze];
        const int32_t* nb_e = nb_tbl + ((int64_t)t * 16 + caze) * 6;
        const int32_t* dir_e = dir_tbl + ((int64_t)t * 16 + caze) * 6;
        for (int k = 0; k < nt; ++k) {
          for (int v = 0; v < 3; ++v) {
            const int e = k * 3 + v;
            const int nbc = nb_e[e];
            int32_t s = nslot[nbc];
            if (s == -3) {
              const int32_t* off = corners + 3 * nbc;
              const int nx = lx + off[0], ny = ly + off[1], nz = lz + off[2];
              const int sx = nx >> 2, sy = ny >> 2, sz = nz >> 2;
              const int a8 = sx + 2 * sy + 4 * sz;
              int32_t r2 = adj[a8];
              if (r2 == -2) {
                r2 = find_row(((bz + sz) * B3 + (by + sy)) * B3 + (bx + sx));
                adj[a8] = r2;
              }
              s = -1;
              if (r2 >= 0) {
                const int nb_bit = (nz & 3) * s2 + (ny & 3) * S + (nx & 3);
                const uint64_t m2 = cmask64[r2];
                if (m2 >> nb_bit & 1u)
                  s = cbase[r2]
                      + __builtin_popcountll(m2
                                             & (((uint64_t)1 << nb_bit) - 1));
              }
              nslot[nbc] = s;
            }
            if (s < 0) return -1;
            const uint64_t p = pv[s];
            out_faces[ntri * 3 + v] =
                (int32_t)((p >> 28) + (p >> (4 * dir_e[e]) & 15u));
          }
          ++ntri;
        }
      }
    }
  }
  return ntri;
}

// Verts pass driven by the scan's block rows (cell coords come from the
// block walk — no id list, no div/mod per cell). compact != 0 reads tq as
// the crossing-only vertex-order stream (ops/marching._compact_tq);
// otherwise tq is the slot-dense [n_cells, D] layout. Returns nv.
// cap bounds BOTH the out_verts rows written and (in compact mode) the tq
// entries read: corrupt records whose crossing popcount exceeds the
// caller's vertex count return -1 instead of writing past the allocation.
int64_t mesh_verts_blocks(const int32_t* bids, const uint32_t* mlo,
                          const uint32_t* mhi, int32_t n_blocks,
                          const uint32_t* recs, const uint16_t* tq,
                          int32_t compact, int32_t n_cells, int32_t R,
                          int32_t D, int64_t cap, const int32_t* pair_i,
                          const int32_t* pair_j, const int32_t* corners,
                          const float* bbox, float* out_verts) {
  const int64_t E = R;
  const int S = 4, s2 = 16;
  const int64_t B3 = (E + S - 1) / S;
  const double lo[3] = {bbox[0], bbox[1], bbox[2]};
  const double span[3] = {bbox[3] - bbox[0], bbox[4] - bbox[1],
                          bbox[5] - bbox[2]};
  const double inv = 1.0 / (R - 1);
  int64_t nv = 0;
  int64_t i = 0;
  for (int32_t b = 0; b < n_blocks && i < n_cells; ++b) {
    const uint64_t m = (uint64_t)mlo[b] | ((uint64_t)mhi[b] << 32);
    if (!m) continue;
    const int64_t bid = bids[b];
    const int64_t bz = bid / (B3 * B3), by = (bid / B3) % B3, bx = bid % B3;
    const int64_t gx0 = bx * S, gy0 = by * S, gz0 = bz * S;
    for (uint64_t mm = m; mm && i < n_cells; mm &= mm - 1, ++i) {
      const int l = __builtin_ctzll(mm);
      const int64_t cx = gx0 + l % S, cy = gy0 + (l / S) % S,
                    cz = gz0 + l / s2;
      const uint32_t cross = recs[i] >> 8;
      for (int d = 0; d < D; ++d) {
        if (!(cross >> d & 1u)) continue;
        if (nv >= cap) return -1;  // corrupt records: crossing count
                                   // exceeds the caller's vertex budget
        const int32_t* oi = corners + 3 * pair_i[d];
        const int32_t* oj = corners + 3 * pair_j[d];
        const double t =
            (compact ? tq[nv] : tq[i * D + d]) * (1.0 / 65535.0);
        const int64_t gi[3] = {std::min(cx + oi[0], E - 1),
                               std::min(cy + oi[1], E - 1),
                               std::min(cz + oi[2], E - 1)};
        const int64_t gj[3] = {std::min(cx + oj[0], E - 1),
                               std::min(cy + oj[1], E - 1),
                               std::min(cz + oj[2], E - 1)};
        for (int a = 0; a < 3; ++a) {
          const double pi = lo[a] + gi[a] * inv * span[a];
          const double pj = lo[a] + gj[a] * inv * span[a];
          out_verts[nv * 3 + a] = (float)(pi + t * (pj - pi));
        }
        ++nv;
      }
    }
  }
  return nv;
}

// Verts pass only: positions for every crossing edge, slot-major /
// direction-minor (identical order to mesh_assemble). Returns nv.
int64_t mesh_verts(const int32_t* ids, const uint32_t* recs,
                   const uint16_t* tq, int32_t n_cells, int32_t R, int32_t D,
                   const int32_t* pair_i, const int32_t* pair_j,
                   const int32_t* corners, const float* bbox,
                   float* out_verts) {
  const int64_t E = R;
  const double lo[3] = {bbox[0], bbox[1], bbox[2]};
  const double span[3] = {bbox[3] - bbox[0], bbox[4] - bbox[1],
                          bbox[5] - bbox[2]};
  const double inv = 1.0 / (R - 1);
  int64_t nv = 0;
  for (int32_t i = 0; i < n_cells; ++i) {
    const int64_t cid = ids[i];
    const int64_t cz = cid / (E * E), cy = (cid / E) % E, cx = cid % E;
    const uint32_t cross = recs[i] >> 8;
    for (int d = 0; d < D; ++d) {
      if (!(cross >> d & 1u)) continue;
      const int32_t* oi = corners + 3 * pair_i[d];
      const int32_t* oj = corners + 3 * pair_j[d];
      const double t = tq[(int64_t)i * D + d] * (1.0 / 65535.0);
      const int64_t gi[3] = {std::min(cx + oi[0], E - 1),
                             std::min(cy + oi[1], E - 1),
                             std::min(cz + oi[2], E - 1)};
      const int64_t gj[3] = {std::min(cx + oj[0], E - 1),
                             std::min(cy + oj[1], E - 1),
                             std::min(cz + oj[2], E - 1)};
      for (int a = 0; a < 3; ++a) {
        const double pi = lo[a] + gi[a] * inv * span[a];
        const double pj = lo[a] + gj[a] * inv * span[a];
        out_verts[nv * 3 + a] = (float)(pi + t * (pj - pi));
      }
      ++nv;
    }
  }
  return nv;
}

// ---- incremental (lag-1) variants for chunk-overlapped assembly ----
//
// The chunked record stage's fetch streams land one after another (chunk k
// completes on-device ~2 ms before chunk k+1); the join-all-then-assemble
// flow leaves the WHOLE faces+verts cost (~8 ms at 351k tris) serial after
// the last stream. These variants process each chunk as it lands: verts are
// slot-local (lag 0), faces resume row by row as soon as every neighbor row's
// records are available (lag 1 in practice — a cell's neighbors have ids at
// most R^2+R+1 larger, a few hundred slots at production densities). After
// the last chunk lands only ITS faces/verts remain. Emission order is
// identical to the one-shot passes, so the output is bit-identical.

// Derive records for the slot range [i0, i1): imask/out are CHUNK-LOCAL
// (slot i at index i-i0). Same semantics as derive_recs otherwise.
int derive_recs_range(const int32_t* bids, const uint32_t* mlo,
                      const uint32_t* mhi, int32_t n_rows,
                      const uint8_t* imask, int64_t i0, int64_t i1,
                      int32_t R, int32_t D, const int32_t* pair_j,
                      const int32_t* bad, uint32_t* out) {
  const int64_t E = R;
  const int S = 4;
  const int64_t B3 = (E + S - 1) / S;
  int64_t i = 0;
  for (int32_t r = 0; r < n_rows && i < i1; ++r) {
    uint64_t m = (uint64_t)mlo[r] | ((uint64_t)mhi[r] << 32);
    if (!m) continue;
    const int pc = __builtin_popcountll(m);
    if (i + pc <= i0) {  // row entirely before the range: skip
      i += pc;
      continue;
    }
    const int64_t bid = bids[r];
    const int64_t bx = (bid % B3) * S;
    const int64_t by = ((bid / B3) % B3) * S;
    const int64_t bz = (bid / (B3 * B3)) * S;
    for (; m && i < i1; m &= m - 1, ++i) {
      if (i < i0) continue;
      const int li = __builtin_ctzll(m);
      const uint32_t ghost = ((bx + li % S == E - 1) ? 1u : 0u) |
                             ((by + (li / S) % S == E - 1) ? 2u : 0u) |
                             ((bz + li / (S * S) == E - 1) ? 4u : 0u);
      const uint32_t inside = imask[i - i0];
      uint32_t cross = 0;
      for (int d = 0; d < D; ++d) {
        if ((uint32_t)bad[d] & ghost) continue;
        if ((inside & 1u) != ((inside >> pair_j[d]) & 1u)) cross |= 1u << d;
      }
      out[i - i0] = (cross << 8) | inside;
    }
  }
  if (i < i0) i = i0;
  for (; i < i1; ++i) out[i - i0] = imask[i - i0];  // slots past the cells
  return 0;
}

// Resumable faces pass: emits triangles for every block row whose full
// 2x2x2 forward neighborhood has records below `avail`, then stops and
// saves its position. state[5] (caller zero-inits): [0] next row index
// (over the COMPACTED nonzero rows), [1] next slot, [2] ntri so far,
// [3] pv fill watermark, [4] running vertex count at the watermark.
// pv is a caller-allocated uint64[n_cells] scratch persisted across calls
// (packed vertex bases, as mesh_faces_blocks). Returns ntri-so-far, or
// -1/-2 on corrupt input. Call with avail == n_cells to finish.
int64_t mesh_faces_blocks_incr(
    const int32_t* bids, const uint32_t* mlo, const uint32_t* mhi,
    int32_t n_blocks, const uint32_t* recs, int32_t n_cells, int64_t avail,
    int32_t R, int32_t D, const int32_t* corners, const int32_t* tets,
    const int32_t* counts_tbl, const int32_t* nb_tbl, const int32_t* dir_tbl,
    uint64_t* pv, int64_t* state, int32_t* out_faces) {
  const int64_t E = R;
  const int S = 4, s2 = 16;
  const int64_t B3 = (E + S - 1) / S;
  if (avail > n_cells) avail = n_cells;

  // compact the nonzero rows (cheap: one sweep over ~2k rows per call)
  std::vector<int32_t> cbid;
  std::vector<int32_t> cbase;
  std::vector<uint64_t> cmask64;
  cbid.reserve(n_blocks);
  cbase.reserve(n_blocks);
  cmask64.reserve(n_blocks);
  {
    int64_t base = 0, prev = -1;
    for (int32_t b = 0; b < n_blocks; ++b) {
      const uint64_t m = (uint64_t)mlo[b] | ((uint64_t)mhi[b] << 32);
      if (!m) continue;
      if (bids[b] <= prev) return -2;
      prev = bids[b];
      cbid.push_back(bids[b]);
      cbase.push_back((int32_t)base);
      cmask64.push_back(m);
      base += __builtin_popcountll(m);
    }
    if (base != n_cells) return -2;
  }
  const int32_t nb_rows = (int32_t)cbid.size();
  auto find_row = [&](int64_t bid) -> int32_t {
    auto it = std::lower_bound(cbid.begin(), cbid.end(), (int32_t)bid);
    if (it == cbid.end() || *it != (int32_t)bid) return -1;
    return (int32_t)(it - cbid.begin());
  };
  auto row_end = [&](int32_t r) -> int64_t {
    return cbase[r] + __builtin_popcountll(cmask64[r]);
  };

  uint8_t caze_lut[6][256];
  for (int t = 0; t < 6; ++t)
    for (int m = 0; m < 256; ++m) {
      int caze = 0;
      for (int j = 0; j < 4; ++j) caze |= (m >> tets[t * 4 + j] & 1) << j;
      caze_lut[t][m] = (uint8_t)caze;
    }

  // extend the packed vertex bases over the newly available records
  {
    int64_t nv = state[4];
    for (int64_t i = state[3]; i < avail; ++i) {
      const uint32_t cm = recs[i] >> 8;
      uint64_t nib = 0;
      int rank = 0;
      for (int d = 0; d < D; ++d) {
        nib |= (uint64_t)rank << (4 * d);
        rank += cm >> d & 1u;
      }
      pv[i] = ((uint64_t)nv << 28) | nib;
      nv += rank;
    }
    if (avail > state[3]) {
      state[3] = avail;
      state[4] = nv;
    }
  }

  int64_t ntri = state[2];
  int32_t adj[8];
  int32_t nslot[8];
  int32_t row = (int32_t)state[0];
  int64_t i = state[1];
  for (; row < nb_rows; ++row) {
    if (row_end(row) > avail) break;  // own records incomplete
    const int64_t bid = cbid[row];
    const int64_t bz = bid / (B3 * B3), by = (bid / B3) % B3, bx = bid % B3;
    // resolve the full forward 2x2x2 neighborhood up front; stop if any
    // existing neighbor row's records are not yet available
    bool safe = true;
    adj[0] = row;
    for (int a8 = 1; a8 < 8; ++a8) {
      const int sx = a8 & 1, sy = (a8 >> 1) & 1, sz = (a8 >> 2) & 1;
      const int32_t r2 =
          find_row(((bz + sz) * B3 + (by + sy)) * B3 + (bx + sx));
      adj[a8] = r2;
      if (r2 >= 0 && row_end(r2) > avail) {
        safe = false;
        break;
      }
    }
    if (!safe) break;
    const int64_t gx0 = bx * S, gy0 = by * S, gz0 = bz * S;
    for (uint64_t mm = cmask64[row]; mm; mm &= mm - 1, ++i) {
      const int l = __builtin_ctzll(mm);
      const int lz = l / s2, ly = (l / S) % S, lx = l % S;
      const int64_t cx = gx0 + lx, cy = gy0 + ly, cz = gz0 + lz;
      if (cx > R - 2 || cy > R - 2 || cz > R - 2) continue;  // ghost cell
      const uint32_t inside = recs[i] & 0xffu;
      for (int c8 = 0; c8 < 8; ++c8) nslot[c8] = -3;
      nslot[0] = (int32_t)i;
      for (int t = 0; t < 6; ++t) {
        const int caze = caze_lut[t][inside];
        const int nt = counts_tbl[t * 16 + caze];
        const int32_t* nb_e = nb_tbl + ((int64_t)t * 16 + caze) * 6;
        const int32_t* dir_e = dir_tbl + ((int64_t)t * 16 + caze) * 6;
        for (int k = 0; k < nt; ++k) {
          for (int v = 0; v < 3; ++v) {
            const int e = k * 3 + v;
            const int nbc = nb_e[e];
            int32_t s = nslot[nbc];
            if (s == -3) {
              const int32_t* off = corners + 3 * nbc;
              const int nx = lx + off[0], ny = ly + off[1], nz = lz + off[2];
              const int a8 = (nx >> 2) + 2 * (ny >> 2) + 4 * (nz >> 2);
              const int32_t r2 = adj[a8];
              s = -1;
              if (r2 >= 0) {
                const int nb_bit = (nz & 3) * s2 + (ny & 3) * S + (nx & 3);
                const uint64_t m2 = cmask64[r2];
                if (m2 >> nb_bit & 1u)
                  s = cbase[r2]
                      + __builtin_popcountll(m2
                                             & (((uint64_t)1 << nb_bit) - 1));
              }
              nslot[nbc] = s;
            }
            if (s < 0) return -1;
            const uint64_t p = pv[s];
            out_faces[ntri * 3 + v] =
                (int32_t)((p >> 28) + (p >> (4 * dir_e[e]) & 15u));
          }
          ++ntri;
        }
      }
    }
  }
  state[0] = row;
  state[1] = i;
  state[2] = ntri;
  return ntri;
}

// Verts for the slot range [i0, i1): recs is CHUNK-LOCAL (slot i at
// recs[i-i0]); in compact mode tq is the chunk's own crossing-only stream
// (local vertex order). out_verts starts at the range's first vertex (the
// caller offsets by the global vertex prefix). Returns the range's vertex
// count, or -1 when it would exceed cap.
int64_t mesh_verts_blocks_range(
    const int32_t* bids, const uint32_t* mlo, const uint32_t* mhi,
    int32_t n_blocks, const uint32_t* recs, const uint16_t* tq,
    int32_t compact, int64_t i0, int64_t i1, int32_t R, int32_t D,
    int64_t cap, const int32_t* pair_i, const int32_t* pair_j,
    const int32_t* corners, const float* bbox, float* out_verts) {
  const int64_t E = R;
  const int S = 4, s2 = 16;
  const int64_t B3 = (E + S - 1) / S;
  const double lo[3] = {bbox[0], bbox[1], bbox[2]};
  const double span[3] = {bbox[3] - bbox[0], bbox[4] - bbox[1],
                          bbox[5] - bbox[2]};
  const double inv = 1.0 / (R - 1);
  int64_t nv = 0;
  int64_t i = 0;
  for (int32_t b = 0; b < n_blocks && i < i1; ++b) {
    const uint64_t m = (uint64_t)mlo[b] | ((uint64_t)mhi[b] << 32);
    if (!m) continue;
    const int pc = __builtin_popcountll(m);
    if (i + pc <= i0) {
      i += pc;
      continue;
    }
    const int64_t bid = bids[b];
    const int64_t bz = bid / (B3 * B3), by = (bid / B3) % B3, bx = bid % B3;
    const int64_t gx0 = bx * S, gy0 = by * S, gz0 = bz * S;
    for (uint64_t mm = m; mm && i < i1; mm &= mm - 1, ++i) {
      if (i < i0) continue;
      const int l = __builtin_ctzll(mm);
      const int64_t cx = gx0 + l % S, cy = gy0 + (l / S) % S,
                    cz = gz0 + l / s2;
      const uint32_t cross = recs[i - i0] >> 8;
      for (int d = 0; d < D; ++d) {
        if (!(cross >> d & 1u)) continue;
        if (nv >= cap) return -1;
        const int32_t* oi = corners + 3 * pair_i[d];
        const int32_t* oj = corners + 3 * pair_j[d];
        const double t =
            (compact ? tq[nv] : tq[(i - i0) * D + d]) * (1.0 / 65535.0);
        const int64_t gi[3] = {std::min(cx + oi[0], E - 1),
                               std::min(cy + oi[1], E - 1),
                               std::min(cz + oi[2], E - 1)};
        const int64_t gj[3] = {std::min(cx + oj[0], E - 1),
                               std::min(cy + oj[1], E - 1),
                               std::min(cz + oj[2], E - 1)};
        for (int a = 0; a < 3; ++a) {
          const double pi = lo[a] + gi[a] * inv * span[a];
          const double pj = lo[a] + gj[a] * inv * span[a];
          out_verts[nv * 3 + a] = (float)(pi + t * (pj - pi));
        }
        ++nv;
      }
    }
  }
  return nv;
}

// Derive the u32 (cross<<8 | inside) records from the fetched u8
// inside-mask stream (host mirror of ops/marching._records_from_words):
// all owned edges share corner 0, so cross bit d is just "corner 0's
// inside bit differs from corner pair_j[d]'s", suppressed where the
// (clamped) edge aliases out of the grid at a cell on the E-1 boundary
// (bad[d] = bitmask of axes the edge extends along). Shipping only the
// 8-bit inside mask halves the rec stream's tunnel bytes; this pass is
// ~0.2 ms at 165k slots. Cells come from the scan's (block id, mask)
// rows in (block-ascending, bit-ascending) order — exactly the device
// compaction's slot order; slots >= the encoded cell count keep cross=0
// (the device zeroed their cross too). When the rows encode MORE cells
// than there are slots (record slots under-covered the scan — the
// speculative path's bail case) derivation stops at n_slots and returns
// the excess; the caller's mask-count-vs-slots check rejects the stream.
int derive_recs(const int32_t* bids, const uint32_t* mlo,
                const uint32_t* mhi, int32_t n_rows, const uint8_t* imask,
                int64_t n_slots, int32_t R, int32_t D,
                const int32_t* pair_j, const int32_t* bad, uint32_t* out) {
  const int64_t E = R;
  const int S = 4;
  const int64_t B3 = (E + S - 1) / S;
  int64_t i = 0;
  for (int32_t r = 0; r < n_rows && i < n_slots; ++r) {
    uint64_t m = (uint64_t)mlo[r] | ((uint64_t)mhi[r] << 32);
    if (!m) continue;
    const int64_t bid = bids[r];
    const int64_t bx = (bid % B3) * S;
    const int64_t by = ((bid / B3) % B3) * S;
    const int64_t bz = (bid / (B3 * B3)) * S;
    for (; m && i < n_slots; m &= m - 1, ++i) {
      const int li = __builtin_ctzll(m);
      const uint32_t ghost = ((bx + li % S == E - 1) ? 1u : 0u) |
                             ((by + (li / S) % S == E - 1) ? 2u : 0u) |
                             ((bz + li / (S * S) == E - 1) ? 4u : 0u);
      const uint32_t inside = imask[i];
      uint32_t cross = 0;
      for (int d = 0; d < D; ++d) {
        if ((uint32_t)bad[d] & ghost) continue;
        if ((inside & 1u) != ((inside >> pair_j[d]) & 1u)) cross |= 1u << d;
      }
      out[i] = (cross << 8) | inside;
    }
  }
  for (; i < n_slots; ++i) out[i] = imask[i];
  return 0;  // (excess cells, if any, surface via the caller's count check)
}

}  // extern "C"
