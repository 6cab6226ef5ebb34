"""On-device iso-surface extraction (replaces the closed-source Vega
`computeMarchingCubes` binary, test/create_sdf.py:319-323).

Method: marching tetrahedra over the Kuhn 6-tet cube decomposition. Each cube
splits into 6 tetrahedra around the main diagonal c0-c6; the split is
translation-consistent across cube faces, so the output mesh is watertight.
Every tet contributes 0-2 triangles whose vertices lie on tet edges at the
interpolated iso crossing.

XLA-native design: variable-size output vs static shapes (SURVEY.md "hard
parts" #2) is solved count-then-compact. The PRODUCTION path is the
owned-edge extractor (extract_mesh_owned, below): a hierarchical active-cell
scan, then two passes that produce a welded mesh BY CONSTRUCTION — each mesh
vertex lives on a unique grid edge owned by exactly one (possibly ghost)
cell, so no sort/weld stage exists at all. Two older implementations remain
as independent oracles: marching_tets (triangle soup + canonical edge keys,
compacted by a while-loop scatter) with host `weld` / device `weld_device`
(radix-style double argsort).

The 6x16 case tables are DERIVED at import: for each tet and sign case the
edge list is produced by set algebra and the winding fixed numerically so
triangle normals point from inside (value < iso) to outside — immune to the
hand-typed-table errors classic MC implementations suffer.
"""
from __future__ import annotations

import functools
import threading
from subprocess import CalledProcessError

import jax
import jax.numpy as jnp
import numpy as np

# Cube corner offsets (x, y, z), indexed 0..7.
CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
], dtype=np.int32)

# Kuhn decomposition: 6 tets around the main diagonal c0-c6.
TETS = np.array([
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
], dtype=np.int32)

_N_SLOTS = 12  # 6 tets x up to 2 triangles


@functools.lru_cache(maxsize=1)
def _tables() -> tuple[np.ndarray, np.ndarray]:
    """Derive ([6,16,2,3,2] edge tables, [6,16] tri counts).

    edge table entries are (cube_corner_i, cube_corner_j) pairs; -1 padding.
    Winding is fixed numerically per (tet, case): normals point from the
    inside set (value < iso) toward the outside set.
    """
    edges = np.full((6, 16, 2, 3, 2), -1, dtype=np.int32)
    counts = np.zeros((6, 16), dtype=np.int32)
    corners_f = CORNERS.astype(np.float64)

    for t, tet in enumerate(TETS):
        pos = corners_f[tet]  # [4,3] tet corner positions
        for case in range(1, 15):
            inside = [i for i in range(4) if case & (1 << i)]
            outside = [i for i in range(4) if not case & (1 << i)]
            if len(inside) == 1:
                i = inside[0]
                tris = [[(i, outside[0]), (i, outside[1]), (i, outside[2])]]
            elif len(inside) == 3:
                o = outside[0]
                tris = [[(inside[0], o), (inside[1], o), (inside[2], o)]]
            else:  # 2 inside -> quad -> 2 triangles
                i0, i1 = inside
                o0, o1 = outside
                tris = [[(i0, o0), (i0, o1), (i1, o1)],
                        [(i0, o0), (i1, o1), (i1, o0)]]
            out_dir = pos[outside].mean(axis=0) - pos[inside].mean(axis=0)
            for k, tri in enumerate(tris):
                pts = np.array([(pos[a] + pos[b]) / 2.0 for a, b in tri])
                n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
                if np.dot(n, out_dir) < 0:
                    tri = [tri[0], tri[2], tri[1]]
                for v, (a, b) in enumerate(tri):
                    edges[t, case, k, v] = (tet[a], tet[b])
            counts[t, case] = len(tris)
    return edges, counts


def _cell_triangles(corner_vals: jnp.ndarray, corner_pos: jnp.ndarray,
                    corner_gid: jnp.ndarray, iso: float
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized over M cells.

    corner_vals [M,8]; corner_pos [M,8,3]; corner_gid [M,8] int32 global ids.
    Returns (tri_pos [M,12,3,3], tri_keys [M,12,3,2] int32, valid [M,12]).
    """
    edges_tbl, counts_tbl = _tables()
    edges_j = jnp.asarray(edges_tbl)          # [6,16,2,3,2]
    counts_j = jnp.asarray(counts_tbl)        # [6,16]
    tets = jnp.asarray(TETS)

    inside = (corner_vals < iso).astype(jnp.int32)  # [M,8]
    # per-tet case ids: bits of the 4 tet corners
    tet_corners = inside[:, tets]             # [M,6,4]
    weights = jnp.asarray([1, 2, 4, 8], jnp.int32)
    case = jnp.sum(tet_corners * weights, axis=-1)   # [M,6]

    # table lookup + corner gathers as ONE-HOT contractions over the tiny
    # case/corner axes: TPU lowers per-row gathers to ~30ns latency-bound
    # loads, while these einsums are pure VPU/MXU throughput.
    case_oh = (case[..., None]
               == jnp.arange(16, dtype=jnp.int32)).astype(jnp.float32)
    table = edges_j.reshape(6, 16, 12).astype(jnp.float32)  # [6,16,12]
    tri_edges = jnp.einsum("mgc,gcd->mgd", case_oh, table
                           ).round().astype(jnp.int32).reshape(
        case.shape[0], 6, 2, 3, 2)
    counts_f = counts_j.astype(jnp.float32)
    n_tris = jnp.einsum("mgc,gc->mg", case_oh, counts_f
                        ).round().astype(jnp.int32)         # [M,6]
    slot = jnp.arange(2, dtype=jnp.int32)
    valid = slot[None, None, :] < n_tris[..., None]    # [M,6,2]

    ci = jnp.maximum(tri_edges[..., 0], 0)             # [M,6,2,3]
    cj = jnp.maximum(tri_edges[..., 1], 0)

    m = corner_vals.shape[0]

    def pick(idx, data):
        """One-hot gather over the 8-corner axis: idx [M,36], data [M,8,D]."""
        oh = (idx[..., None]
              == jnp.arange(8, dtype=jnp.int32)).astype(data.dtype)
        return jnp.einsum("mse,med->msd", oh, data)

    flat_idx_i = ci.reshape(m, -1)                     # [M,36]
    flat_idx_j = cj.reshape(m, -1)
    vals3 = corner_vals[..., None]
    # gids reach R^3 > 2^24 (f32 exact-integer limit): pick hi/lo halves
    gid_parts = jnp.stack([corner_gid // 4096, corner_gid % 4096],
                          axis=-1).astype(jnp.float32)
    vi = pick(flat_idx_i, vals3)[..., 0].reshape(ci.shape)
    vj = pick(flat_idx_j, vals3)[..., 0].reshape(ci.shape)
    pi = pick(flat_idx_i, corner_pos).reshape(ci.shape + (3,))
    pj = pick(flat_idx_j, corner_pos).reshape(ci.shape + (3,))

    def pick_gid(idx):
        parts = pick(idx, gid_parts).round().astype(jnp.int32)
        return (parts[..., 0] * 4096 + parts[..., 1]).reshape(ci.shape)

    gi = pick_gid(flat_idx_i)
    gj = pick_gid(flat_idx_j)

    denom = vj - vi
    t = jnp.where(jnp.abs(denom) > 1e-12, (iso - vi) / denom, 0.5)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    pts = pi + t * (pj - pi)                           # [M,6,2,3,3]

    keys = jnp.stack([jnp.minimum(gi, gj), jnp.maximum(gi, gj)], axis=-1)
    tri_pos = pts.reshape(m, _N_SLOTS, 3, 3)
    tri_keys = keys.reshape(m, _N_SLOTS, 3, 2)
    return tri_pos, tri_keys, valid.reshape(m, _N_SLOTS)


def _active_cells(volume: jnp.ndarray, iso: float, cap: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compacted flat ids of cells whose 8 corners straddle the iso surface.

    Only O(surface area) cells produce triangles; compacting first turns the
    extraction from a full-volume scatter sweep (O(R^3) latency-bound work
    that crashed the TPU runtime at 257^3) into a short loop over surface
    cells. Returns (ids [cap] i32, count)."""
    R = volume.shape[0]
    c = R - 1
    inside = volume < iso
    corners = jnp.stack([
        inside[dz:dz + c, dy:dy + c, dx:dx + c]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)])
    change = (jnp.any(corners, axis=0) & ~jnp.all(corners, axis=0)).reshape(-1)
    csum = jnp.cumsum(change.astype(jnp.int32))
    idx = jnp.where(change, csum - 1, cap)
    ids = jnp.zeros((cap,), jnp.int32).at[idx].set(
        jnp.arange(change.shape[0], dtype=jnp.int32), mode="drop")
    return ids, csum[-1]


def _cell_corner_data(volume: jnp.ndarray, cell_ids: jnp.ndarray,
                      sdf_params: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Corner (values, positions, gids) for a batch of flat cell ids.

    volume [R,R,R] (z,y,x); cell_ids [B] flat over the (R-1)^3 cell grid.
    Returns [B,8], [B,8,3], [B,8]."""
    R = volume.shape[0]
    c = R - 1
    cz = cell_ids // (c * c)
    cy = (cell_ids // c) % c
    cx = cell_ids % c
    offs = jnp.asarray(CORNERS)  # [8,3] (x,y,z)
    gx = cx[:, None] + offs[None, :, 0]
    gy = cy[:, None] + offs[None, :, 1]
    gz = cz[:, None] + offs[None, :, 2]
    gid = ((gz * R + gy) * R + gx).astype(jnp.int32)
    vals = volume.reshape(-1)[gid]
    denom = jnp.float32(R - 1)
    lo = sdf_params[0:3]
    hi = sdf_params[3:6]
    pos = jnp.stack([
        lo[0] + gx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
        lo[1] + gy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
        lo[2] + gz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
    ], axis=-1)
    return vals, pos, gid


def marching_tets(volume: jnp.ndarray, sdf_params: jnp.ndarray,
                  iso: float = 0.0, max_tris: int = 1 << 20,
                  cell_batch: int = 16384
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract iso-surface triangles from a [R,R,R] (z,y,x-indexed) volume.

    Returns (tri_pos [max_tris,3,3] f32, tri_keys [max_tris,3,2] i32, count).
    Slots >= count are zero. Two-phase XLA design: sign-change cells compact
    into a static-cap list (every surface cell yields >=1 triangle, so the
    triangle cap also bounds the cell count), then a while_loop walks only
    the occupied batches — trip count scales with surface area, not volume.
    """
    cell_cap = -(-max_tris // cell_batch) * cell_batch
    cell_ids, n_cells = _active_cells(volume, iso, cell_cap)

    pos_buf = jnp.zeros((max_tris, 3, 3), jnp.float32)
    key_buf = jnp.zeros((max_tris, 3, 2), jnp.int32)

    def cond(carry):
        i, *_ = carry
        return i * cell_batch < jnp.minimum(n_cells, cell_cap)

    def body(carry):
        i, pos_buf, key_buf, count = carry
        batch_ids = jax.lax.dynamic_slice_in_dim(
            cell_ids, i * cell_batch, cell_batch)
        vals, pos, gid = _cell_corner_data(volume, batch_ids, sdf_params)
        tri_pos, tri_keys, valid = _cell_triangles(vals, pos, gid, iso)
        in_range = (i * cell_batch
                    + jax.lax.broadcasted_iota(jnp.int32, (cell_batch, 1), 0)
                    ) < n_cells
        valid = valid & in_range
        tri_pos = tri_pos.reshape(cell_batch * _N_SLOTS, 3, 3)
        tri_keys = tri_keys.reshape(cell_batch * _N_SLOTS, 3, 2)
        valid = valid.reshape(cell_batch * _N_SLOTS)
        csum = jnp.cumsum(valid.astype(jnp.int32))
        idx = jnp.where(valid, count + csum - 1, max_tris)  # OOB -> dropped
        # indices are unique by construction (exclusive cumsum positions).
        # NOTE: profiling shows XLA still copies the carried 60MB buffers per
        # iteration (~172ms/image at 257^3) despite the unique_indices hint —
        # a chunked-emit + single-compaction restructure is the round-2 fix
        pos_buf = pos_buf.at[idx].set(tri_pos, mode="drop",
                                      unique_indices=True)
        key_buf = key_buf.at[idx].set(tri_keys, mode="drop",
                                      unique_indices=True)
        return i + 1, pos_buf, key_buf, count + csum[-1]

    _, pos_buf, key_buf, count = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pos_buf, key_buf, jnp.int32(0)))
    # overflow detection: if more surface cells exist than the cap, surface
    # the fact through the count so extract_mesh raises
    count = jnp.where(n_cells > cell_cap,
                      jnp.int32(max_tris + 1), count)
    return pos_buf, key_buf, count


@functools.partial(jax.jit, static_argnames=("iso", "max_tris"))
def marching_tets_jit(volume, sdf_params, iso: float = 0.0,
                      max_tris: int = 1 << 20):
    return marching_tets(volume, sdf_params, iso=iso, max_tris=max_tris)


# ---------------------------------------------------------------------------
# chunked-emit variant: the while_loop above carries the [max_tris] buffers
# and XLA copies them every iteration (~172ms/image at 257^3). Here the
# active-cell count syncs to the host once, chunk triangles are emitted via
# lax.map (stacked outputs, no carry), and ONE final scatter compacts. The
# map length is bucketed to powers of two to bound recompilation.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iso", "cap"))
def _active_cells_jit(volume, iso: float, cap: int):
    return _active_cells(volume, iso, cap)


@functools.partial(jax.jit, static_argnames=("iso", "n_iter", "cell_batch",
                                              "max_tris"))
def _emit_and_compact(volume, sdf_params, cell_ids, count, iso: float,
                      n_iter: int, cell_batch: int, max_tris: int):
    def chunk(i):
        batch_ids = jax.lax.dynamic_slice_in_dim(
            cell_ids, i * cell_batch, cell_batch)
        vals, pos, gid = _cell_corner_data(volume, batch_ids, sdf_params)
        tri_pos, tri_keys, valid = _cell_triangles(vals, pos, gid, iso)
        in_range = (i * cell_batch
                    + jax.lax.broadcasted_iota(jnp.int32, (cell_batch, 1), 0)
                    ) < count
        valid = valid & in_range
        return (tri_pos.reshape(cell_batch * _N_SLOTS, 3, 3),
                tri_keys.reshape(cell_batch * _N_SLOTS, 3, 2),
                valid.reshape(cell_batch * _N_SLOTS))

    pos_c, key_c, valid_c = jax.lax.map(
        chunk, jnp.arange(n_iter, dtype=jnp.int32))
    pos_c = pos_c.reshape(-1, 3, 3)
    key_c = key_c.reshape(-1, 3, 2)
    valid_c = valid_c.reshape(-1)
    csum = jnp.cumsum(valid_c.astype(jnp.int32))
    idx = jnp.where(valid_c, csum - 1, max_tris)
    pos_buf = jnp.zeros((max_tris, 3, 3), jnp.float32).at[idx].set(
        pos_c, mode="drop", unique_indices=True)
    key_buf = jnp.zeros((max_tris, 3, 2), jnp.int32).at[idx].set(
        key_c, mode="drop", unique_indices=True)
    return pos_buf, key_buf, csum[-1]


def _pow2_bucket(n: int) -> int:
    out = 1
    while out < n:
        out *= 2
    return out


def marching_tets_chunked(volume, sdf_params, iso: float = 0.0,
                          max_tris: int = 1 << 20, cell_batch: int = 16384):
    """Host-driven variant of marching_tets: one tiny count sync, then a
    carry-free emit + single compaction. Returns the same triple."""
    cell_cap = -(-max_tris // cell_batch) * cell_batch
    cell_ids, count = _active_cells_jit(jnp.asarray(volume, jnp.float32),
                                        float(iso), cell_cap)
    c = int(count)
    if c > cell_cap:
        return (jnp.zeros((max_tris, 3, 3), jnp.float32),
                jnp.zeros((max_tris, 3, 2), jnp.int32),
                jnp.int32(max_tris + 1))
    n_iter = min(_pow2_bucket(max(1, -(-c // cell_batch))),
                 cell_cap // cell_batch)
    return _emit_and_compact(jnp.asarray(volume, jnp.float32),
                             jnp.asarray(sdf_params, jnp.float32),
                             cell_ids, count, float(iso), n_iter,
                             cell_batch, max_tris)


@jax.jit
def weld_device(tri_pos: jnp.ndarray, tri_keys: jnp.ndarray,
                count: jnp.ndarray):
    """On-device vertex welding (the host version costs seconds on the
    single-core eval machines, plus a full capped-buffer fetch).

    tri_pos [cap,3,3], tri_keys [cap,3,2] i32, count traced scalar.
    Returns (verts [cap*3,3] (first n_verts valid), faces [cap,3] i32,
    n_verts). int64 is unavailable on TPU by default, so the lexicographic
    (hi, lo) key order comes from two STABLE argsorts (radix style).
    """
    cap = tri_pos.shape[0]
    n = cap * 3
    pos = tri_pos.reshape(n, 3)
    hi = tri_keys[..., 0].reshape(n)
    lo = tri_keys[..., 1].reshape(n)
    slot_valid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] \
        < count * 3
    big = jnp.int32(2 ** 31 - 1)
    hi = jnp.where(slot_valid, hi, big)
    lo = jnp.where(slot_valid, lo, big)
    order1 = jnp.argsort(lo, stable=True)
    order = order1[jnp.argsort(hi[order1], stable=True)]
    hs, ls = hi[order], lo[order]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1])])
    uid = jnp.cumsum(first.astype(jnp.int32)) - 1
    inv = jnp.zeros((n,), jnp.int32).at[order].set(uid)
    verts = jnp.zeros((n, 3), jnp.float32).at[uid].set(pos[order])
    n_verts = uid[-1] + 1 - jnp.where(count * 3 < n, 1, 0)  # drop pad key
    faces = inv.reshape(cap, 3)
    return verts, faces, n_verts


def extract_mesh_device(volume, sdf_params, iso: float = 0.0,
                        max_tris: int | None = None
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Device-chained extraction (production path): owned-edge pipeline —
    no sort/weld pass, welded by construction, packed quantized transfer.
    max_tris (the retry ceiling from the caller) maps to the active-cell
    group cap."""
    gcap = None if max_tris is None else max(512, max_tris // 12)
    return extract_mesh_owned(volume, sdf_params, iso=iso, gcap=gcap,
                              packed=True)


def extract_mesh_device_sorted(volume, sdf_params, iso: float = 0.0,
                               max_tris: int | None = None
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Previous device-chained extraction: marching_tets + sort-based
    weld_device. Kept as an independent implementation for equivalence
    tests (it is ~3x slower at 257^3: carried-buffer copies in the emit
    loop + random-access sort/scatter welding)."""
    R = volume.shape[0]
    if max_tris is None:
        max_tris = min(12 * (R - 1) ** 3, max(1 << 16, 16 * (R - 1) ** 2))
    vol = jnp.asarray(volume, jnp.float32)
    tri_pos, tri_keys, count = marching_tets_jit(
        vol, jnp.asarray(sdf_params, jnp.float32), iso=float(iso),
        max_tris=int(max_tris))
    verts_d, faces_d, n_verts_d = weld_device(tri_pos, tri_keys, count)
    # one combined host round trip for both sizes (each scalar fetch costs a
    # full round trip on tunneled hosts)
    c, nv = jax.device_get((count, n_verts_d))
    c, nv = int(c), int(nv)
    if c > max_tris:
        raise ValueError(f"triangle overflow: {c} > cap {max_tris}")
    verts = np.asarray(verts_d[:nv])
    faces = np.asarray(faces_d[:c])
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts, faces[ok]


def weld(tri_pos: np.ndarray, tri_keys: np.ndarray, count: int
         ) -> tuple[np.ndarray, np.ndarray]:
    """Host-side exact vertex welding via canonical grid-edge keys.

    Returns (vertices [V,3] f32, faces [F,3] i32). Degenerate triangles
    (repeated welded vertex — tet faces lying exactly on the iso) are dropped.
    """
    tri_pos = np.asarray(tri_pos[:count]).reshape(-1, 3)
    keys = np.asarray(tri_keys[:count]).reshape(-1, 2)
    flat = keys[:, 0].astype(np.int64) << 32 | keys[:, 1].astype(np.int64)
    # manual unique+inverse (argsort + diff): ~6x faster than np.unique's
    # return_inverse path on the single-core eval hosts
    order = np.argsort(flat, kind="stable")
    s = flat[order]
    first = np.empty(len(s), bool)
    if len(s):
        first[0] = True
        np.not_equal(s[1:], s[:-1], out=first[1:])
    uid = np.cumsum(first) - 1
    inv = np.empty(len(s), np.int64)
    inv[order] = uid
    n_unique = int(uid[-1]) + 1 if len(s) else 0
    verts = np.zeros((n_unique, 3), np.float32)
    verts[inv] = tri_pos  # last-writer wins; positions per key are identical
    faces = inv.reshape(-1, 3).astype(np.int32)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts, faces[ok]


def extract_mesh(volume: np.ndarray, sdf_params: np.ndarray,
                 iso: float = 0.0, max_tris: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """volume [R,R,R] (z,y,x) -> welded (vertices, faces)."""
    R = volume.shape[0]
    if max_tris is None:
        # surfaces cross O(R^2) cells; oversized caps cost real scatter time
        # (measured 0.70s -> 0.61s at 257^3 going 3.1M -> 1M cap)
        max_tris = min(12 * (R - 1) ** 3, max(1 << 16, 16 * (R - 1) ** 2))
    vol = jnp.asarray(volume, jnp.float32)
    params = jnp.asarray(sdf_params, jnp.float32)
    tri_pos, tri_keys, count = marching_tets_jit(vol, params, iso=float(iso),
                                                 max_tris=int(max_tris))
    count = int(count)
    if count > max_tris:
        raise ValueError(f"triangle overflow: {count} > cap {max_tris}")
    return weld(np.asarray(tri_pos), np.asarray(tri_keys), count)


# ---------------------------------------------------------------------------
# Owned-edge extraction: welded-by-construction mesh, no sort / weld pass.
#
# Every mesh vertex lies on a grid EDGE (a corner pair of some cell). Kuhn
# tetrahedra only ever cut 7 canonical edge directions per cell (3 cube
# edges, 3 face diagonals, 1 body diagonal — derived below, not assumed):
# each cell OWNS the 7 edges whose min corner is its origin. Pass 1
# enumerates owned crossing edges of active cells and assigns each a global
# vertex index by cumsum — every grid edge appears exactly once, so the
# vertex buffer is welded with no sorting. Pass 2 emits triangles whose
# vertices are looked up as vstart[owner] + rank(dir in owner's crossing
# set) through a dense cell->packed(vstart, crossmask) table.
#
# Cells on the high boundary faces own edges of no real cell; a GHOST layer
# of cells (corner lookups clamped to the last plane, so perpendicular
# edges never cross) owns them. Ghost cells emit vertices but never
# triangles. This replaces the marching_tets + weld_device chain, whose
# random-access sort/scatter passes cost ~740 ms at 257^3 on v5e; the
# owned-edge pipeline does one masked scatter per buffer.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _owned_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Derive (pair_i [D], pair_j [D], nb_tbl [6,16,2,3], dir_tbl [6,16,2,3]).

    pair_i/pair_j: corner ids of the canonical owned-edge directions
    (min(offset_i, offset_j) == 0 elementwise), sorted; D == 7 for Kuhn tets.
    nb_tbl: per table triangle vertex, the corner id of the owner-cell offset
    (elementwise min of the two edge-corner offsets).
    dir_tbl: the canonical direction index of that edge within its owner.
    """
    edges, _counts = _tables()
    cid = {tuple(c): i for i, c in enumerate(CORNERS.tolist())}
    pairs = set()
    for t in range(6):
        for case in range(16):
            for k in range(2):
                for v in range(3):
                    a, b = edges[t, case, k, v]
                    if a < 0:
                        continue
                    oa, ob = CORNERS[a], CORNERS[b]
                    m = np.minimum(oa, ob)
                    pa, pb = cid[tuple(oa - m)], cid[tuple(ob - m)]
                    pairs.add((min(pa, pb), max(pa, pb)))
    pairs = sorted(pairs)
    assert len(pairs) <= 13, pairs
    pidx = {p: i for i, p in enumerate(pairs)}
    nb_tbl = np.zeros((6, 16, 2, 3), np.int32)
    dir_tbl = np.zeros((6, 16, 2, 3), np.int32)
    for t in range(6):
        for case in range(16):
            for k in range(2):
                for v in range(3):
                    a, b = edges[t, case, k, v]
                    if a < 0:
                        continue
                    oa, ob = CORNERS[a], CORNERS[b]
                    m = np.minimum(oa, ob)
                    pa, pb = cid[tuple(oa - m)], cid[tuple(ob - m)]
                    nb_tbl[t, case, k, v] = cid[tuple(m)]
                    dir_tbl[t, case, k, v] = pidx[(min(pa, pb), max(pa, pb))]
    pair_i = np.array([p[0] for p in pairs], np.int32)
    pair_j = np.array([p[1] for p in pairs], np.int32)
    return pair_i, pair_j, nb_tbl, dir_tbl


def _sign_change_cells(volume: jnp.ndarray, iso: float) -> jnp.ndarray:
    """[R,R,R] field -> [E,E,E] bool: some corner signs of the (extended)
    cell disagree. Separable 2-neighborhood any/all — 6 shifted pair ops —
    instead of materializing the 8-corner stack (whose shifted slices are
    lane-misaligned copies, ~8 ms of pure relayout at 257^3)."""
    ip = jnp.pad(volume < iso, ((0, 1),) * 3, mode="edge")

    def pair(a, op, axis):
        n = a.shape[axis] - 1
        return op(jax.lax.slice_in_dim(a, 0, n, axis=axis),
                  jax.lax.slice_in_dim(a, 1, n + 1, axis=axis))

    any_ = ip
    all_ = ip
    for ax in (2, 1, 0):
        any_ = pair(any_, jnp.logical_or, ax)
        all_ = pair(all_, jnp.logical_and, ax)
    return any_ & ~all_


@functools.partial(jax.jit, static_argnames=("iso", "gcap"))
def _active_cells_ext(volume: jnp.ndarray, iso: float, gcap: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hierarchical sign-change scan over the EXTENDED cell grid (E=R cells
    per axis; the high ghost layer replicates the last value plane, so ghost
    cells cross only within the boundary faces they own).

    Two-level compaction: 4^3 cell groups compact first (cumsum over
    (E/4)^3), then only the <=gcap surviving groups' cells compact (cumsum
    over gcap*64) — the full-resolution cumsum+scatter of the flat scan
    (~108 ms at 257^3) never happens. Returns (cell ids [gcap*64] flat over
    E^3, n_cells, g_overflow)."""
    R = volume.shape[0]
    E = R
    change = _sign_change_cells(volume, iso)
    G = 4
    Eg = -(-E // G) * G
    ch = jnp.pad(change, ((0, Eg - E),) * 3)
    gq = Eg // G
    grp = ch.reshape(gq, G, gq, G, gq, G).transpose(0, 2, 4, 1, 3, 5)
    grp = grp.reshape(gq ** 3, G ** 3)
    gmask = jnp.any(grp, axis=1)
    gcs = jnp.cumsum(gmask.astype(jnp.int32))
    gidx = jnp.where(gmask, gcs - 1, gcap)
    gids = jnp.zeros((gcap,), jnp.int32).at[gidx].set(
        jnp.arange(gq ** 3, dtype=jnp.int32), mode="drop")
    g_count = gcs[-1]
    rows = jnp.take(grp, gids, axis=0)  # [gcap, 64]
    # padded gids are 0: mask garbage rows or group 0 duplicates
    rows = rows & (jnp.arange(gcap, dtype=jnp.int32)[:, None] < g_count)
    flat = rows.reshape(-1)
    cs = jnp.cumsum(flat.astype(jnp.int32))
    cap = gcap * G ** 3
    cidx = jnp.where(flat, cs - 1, cap)
    # group-level decomposition + static in-group offsets (see the same
    # rewrite in _active_cells_from_coarse)
    gz = gids // (gq * gq)
    gy = (gids // gq) % gq
    gx = gids % gq
    base = ((gz * G) * E + gy * G) * E + gx * G               # [gcap]
    l = np.arange(G ** 3, dtype=np.int32)
    loff = jnp.asarray(((l // (G * G)) * E + ((l // G) % G)) * E + l % G)
    eid = (base[:, None] + loff[None, :]).reshape(-1)
    ids = jnp.zeros((cap,), jnp.int32).at[cidx].set(eid, mode="drop")
    return ids, cs[-1], jnp.maximum(g_count - gcap, 0)


@functools.partial(jax.jit, static_argnames=("iso", "stride", "bcap"))
def _active_cells_from_coarse(volume: jnp.ndarray, coarse_ids: jnp.ndarray,
                              coarse_count: jnp.ndarray, *, iso: float,
                              stride: int, bcap: int
                              ) -> tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Fine sign-change cells scanned only inside the sparse pass's ACTIVE
    coarse cells (plus the ghost shell clamped onto them) — the full-volume
    group-detection sweep of _active_cells_ext never runs.

    SOUND on the sparse-assembled volume: an inactive coarse cell has
    uniform corner signs (sign-change coarse cells are always active) and
    its fine values are sign-preserving trilinear interpolation, so every
    fine corner-sign change lies inside an active coarse cell, or in a
    ghost cell whose clamped corners replicate one (binary mode's dilated
    actives are a superset of its sign-change cells too). Requires
    stride == the scan group size 4 so blocks == coarse cells.

    The block decomposition and z-major compaction are IDENTICAL to
    _active_cells_ext (gq == cgrid+1, G == stride), so the emitted id
    sequence is bit-identical — only blocks provably empty are skipped.

    BITPACKED (round 3): each block's 64 change bits are packed into two
    int32 words by two tiny MXU matmuls (x -> nibble, y -> base-16 digit;
    every weight is a power of two so even a bf16-lowered dot is exact)
    plus one 16-bit shift-combine along z — the [B3,S,B3,S,B3,S] ->
    [B3^3, 64] transpose of the bool field (a 4-element-minor Mosaic
    relayout, ~3.6 ms at 257^3) never materializes. Compaction then keeps
    only candidate blocks that CONTAIN a change bit (cap bcap//2), so the
    final element-level cumsum+scatter runs over half the slot domain.
    Measured 14.1 -> 6.1 ms at 257^3 with a bit-identical id sequence.
    Returns (ids [max(512,bcap//2 rounded to 256)*stride^3] flat over E^3,
    n_cells, overflow, blk [b2cap,3] i32 (block id, mask lo, mask hi))."""
    R = volume.shape[0]
    E = R
    S = stride
    if S ** 3 > 64:
        raise ValueError(f"candidate scan supports stride^3 <= 64, got "
                         f"stride {S}; run _active_cells_ext instead")
    cgrid = (R - 1) // S
    B3 = cgrid + 1  # ghost block column
    change = _sign_change_cells(volume, iso)
    Ep = B3 * S
    ch = jnp.pad(change, ((0, Ep - E),) * 3)
    f32 = jnp.float32
    xs = np.arange(Ep)
    wx = np.zeros((Ep, B3), np.float32)
    wx[xs, xs // S] = 2.0 ** (xs % S)          # x digit: S bits
    wy = np.zeros((Ep, B3), np.float32)
    wy[xs, xs // S] = (2.0 ** S) ** (xs % S)   # y digit: S-bit spacing
    a = jnp.dot(ch.reshape(Ep * Ep, Ep).astype(f32), jnp.asarray(wx),
                preferred_element_type=f32).reshape(Ep, Ep, B3)  # [z, y, bx]
    b = jax.lax.dot_general(a, jnp.asarray(wy),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=f32)  # [z, bx, by]
    bi = b.transpose(0, 2, 1).astype(jnp.int32).reshape(B3, S, B3, B3)
    s2 = S * S  # bits per z layer (f32-exact: values < 2^s2 <= 2^16)
    blo = jnp.zeros_like(bi[:, 0])
    bhi = jnp.zeros_like(bi[:, 0])
    for zl in range(S):
        bit0 = zl * s2
        if bit0 + s2 <= 32:
            blo = blo | (bi[:, zl] << bit0)
        else:
            bhi = bhi | (bi[:, zl] << (bit0 - 32))
    bits = jnp.stack([blo.reshape(-1), bhi.reshape(-1)], axis=-1)  # [B3^3,2]
    # bit l of (lo,hi) = local cell (z=l//s2, y=(l//S)%S, x=l%S) — the same
    # z-major order as _active_cells_ext's in-group offsets
    n_slots = coarse_ids.shape[0]
    valid = jnp.arange(n_slots, dtype=jnp.int32) < coarse_count
    act = jnp.zeros((cgrid ** 3,), bool).at[
        jnp.where(valid, coarse_ids, cgrid ** 3)].set(True, mode="drop")
    # edge-pad == the ghost shell's min-clamp onto boundary actives
    cand = jnp.pad(act.reshape(cgrid, cgrid, cgrid), ((0, 1),) * 3,
                   mode="edge").reshape(-1)
    # correctness guard for fields that violate the band/Lipschitz premise:
    # any change cell OUTSIDE the candidate blocks flips the overflow flag
    # and the caller falls back to the full-volume scan — results are
    # always correct, the candidate scan is only ever a fast path. (The
    # change-block cap bcap//2 rides the same flag: candidate bands are
    # 4-5x thicker than the crossing slab, so a 2x margin holds unless the
    # field is pathologically wiggly — then the fallback, not silence.)
    total_change = jnp.sum(change)
    return _compact_block_bits(bits, cand, bcap=bcap, E=E, S=S, B3=B3,
                               total_change=total_change)


def _compact_block_bits(bits: jnp.ndarray, cand: jnp.ndarray, *, bcap: int,
                        E: int, S: int, B3: int,
                        total_change: jnp.ndarray | None = None,
                        guard: jnp.ndarray | None = None,
                        srow_tbl: jnp.ndarray | None = None):
    """Shared change-block compaction + slot-id expansion (the tail of
    _active_cells_from_coarse, factored so the sparse-words scan emits the
    bit-identical slot sequence). `bits` [B3^3, 2] packed change bits;
    `cand` [B3^3] bool candidate blocks.

    Exactly one of total_change/guard supplies the soundness flag:
    total_change (dense flow) counts changes missed by the candidate set;
    guard (sparse flow) is the caller's precomputed equivalent (coarse
    mixed-sign non-active cells + kernel-vs-lerp low-face sign mismatches
    + boundary actives — see infer/sparse._phase_b_mesh_sparse_jit).

    srow_tbl (sparse flow): [c^3] coarse-cell -> kernel-slot owner table;
    the emitted ids are then SPARSE row ids (slot*64 + bit) addressing the
    [n_kcells*64] words arrays instead of flat E^3 cell ids (the device
    ids never reach the host — assemblers expand E^3 ids from the blk
    stream, which is identical in both flows)."""
    sel = cand & ((bits[:, 0] | bits[:, 1]) != 0)
    b2cap = max(512, -(-(bcap // 2) // 256) * 256)
    bcs = jnp.cumsum(sel.astype(jnp.int32))
    bidx = jnp.where(sel, bcs - 1, b2cap)
    bids = jnp.zeros((b2cap,), jnp.int32).at[bidx].set(
        jnp.arange(B3 ** 3, dtype=jnp.int32), mode="drop")
    b_count = bcs[-1]
    rbits = jnp.take(bits, bids, axis=0)  # [b2cap, 2]
    rbits = rbits * (jnp.arange(b2cap, dtype=jnp.int32)[:, None]
                     < b_count).astype(jnp.int32)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, S ** 3), 1)
    rows = jnp.where(li < 32,
                     jax.lax.shift_right_logical(rbits[:, 0:1], li),
                     jax.lax.shift_right_logical(rbits[:, 1:2],
                                                 jnp.maximum(li - 32, 0))) & 1
    flat = rows.reshape(-1)
    cs = jnp.cumsum(flat)
    cap = b2cap * S ** 3
    cidx = jnp.where(flat > 0, cs - 1, cap)
    bz = bids // (B3 * B3)
    by = (bids // B3) % B3
    bx = bids % B3
    if srow_tbl is None:
        # block-level decomposition + a static in-block offset vector:
        # integer div/mod over the slot space measured ~several ms at 257^3
        base = ((bz * S) * E + by * S) * E + bx * S           # [b2cap]
        l = np.arange(S ** 3, dtype=np.int32)
        loff = jnp.asarray(((l // (S * S)) * E + ((l // S) % S)) * E
                           + l % S)
    else:
        c = B3 - 1
        # ghost blocks (coord == c) are never selected in the sparse flow
        # (their bits are never scattered; boundary actives flip the guard
        # first) — clamp keeps padded rows' arithmetic in range
        cid = (jnp.minimum(bz, c - 1) * c + jnp.minimum(by, c - 1)) * c \
            + jnp.minimum(bx, c - 1)
        base = jnp.maximum(jnp.take(srow_tbl, cid), 0) * (S ** 3)
        loff = jnp.arange(S ** 3, dtype=jnp.int32)
    eid = (base[:, None] + loff[None, :]).reshape(-1)
    ids = jnp.zeros((cap,), jnp.int32).at[cidx].set(eid, mode="drop")
    if guard is None:
        guard = total_change - cs[-1]
    # blk: the compacted (block id, mask lo, mask hi) rows (zero masks past
    # b_count). 12 bytes/block vs 4 bytes/cell — the host reconstructs the
    # id list from this stream (native.mesh_expand_ids) instead of fetching
    # ids over the tunnel (~130 KB vs ~330 KB at production counts)
    blk = jnp.stack([bids, rbits[:, 0], rbits[:, 1]], axis=-1)
    return ids, cs[-1], jnp.maximum(b_count - b2cap, 0) + guard, blk


def _pack8(src_pad: jnp.ndarray, E: int) -> jnp.ndarray:
    """[E+1,E+1,E+1] padded field -> [E^3, 8] rows: every cell's 8 corner
    values contiguously, CORNERS order. One bandwidth-bound pass (8 shifted
    slices, XLA fuses) that converts the extractor's per-corner SCALAR
    gathers into per-cell ROW gathers — TPU gathers cost ~30ns/row
    regardless of row size, so this is ~8x fewer serialized rows. (A (2,2,2)
    windowed jax.lax.gather expresses the same thing without the 8x memory,
    but compiles for tens of minutes on the TPU backend.)"""
    parts = [src_pad[oz:oz + E, oy:oy + E, ox:ox + E]
             for (ox, oy, oz) in CORNERS.tolist()]
    return jnp.stack(parts, axis=-1).reshape(E ** 3, 8)


@functools.partial(jax.jit,
                   static_argnames=("iso", "n_iter", "batch"))
def _extract_owned(volume: jnp.ndarray, sdf_params: jnp.ndarray,
                   cell_ids: jnp.ndarray, n_cells: jnp.ndarray, *,
                   iso: float, n_iter: int, batch: int):
    """Two-pass owned-edge extraction over the first n_iter*batch cell
    slots. Returns (verts [n_slots*D,3] f32, nv, faces [n_slots*12,3] i32,
    ntri) — welded, outward-wound, compacted; slots past the counts are 0."""
    pair_i_np, pair_j_np, nb_tbl, dir_tbl = _owned_tables()
    D = len(pair_i_np)
    R = volume.shape[0]
    E = R
    # edge padding == the per-corner min(.,R-1) clamp of the ghost layer
    vpack = _pack8(jnp.pad(volume, ((0, 1),) * 3, mode="edge"), E)
    offs = jnp.asarray(CORNERS)  # [8,3] (x,y,z)
    tets = jnp.asarray(TETS)
    lo = sdf_params[0:3]
    hi = sdf_params[3:6]
    denom = jnp.float32(R - 1)

    def decode(cids):
        cz = cids // (E * E)
        cy = (cids // E) % E
        cx = cids % E
        return cx, cy, cz

    def corner_data(cids):
        cx, cy, cz = decode(cids)
        gx = jnp.minimum(cx[:, None] + offs[None, :, 0], R - 1)
        gy = jnp.minimum(cy[:, None] + offs[None, :, 1], R - 1)
        gz = jnp.minimum(cz[:, None] + offs[None, :, 2], R - 1)
        vals = jnp.take(vpack, cids, axis=0)
        return vals, gx, gy, gz

    slot_base = jnp.arange(batch, dtype=jnp.int32)

    # ---- pass 1: owned crossing edges -> vertex positions ----
    # ghost-cell aliasing: on a clamped axis a (cell coord == R-1) an edge
    # whose offsets are nonzero on a collapses onto the SAME grid edge as a
    # lower canonical dir — suppress it or it emits duplicate orphan verts.
    # bad[d, a] = either endpoint of dir d has offset 1 on axis a.
    bad_np = ((CORNERS[_owned_tables()[0]] | CORNERS[_owned_tables()[1]])
              > 0)                                              # [D,3] (xyz)
    bad = jnp.asarray(bad_np)

    def vbatch(i):
        cids = jax.lax.dynamic_slice_in_dim(cell_ids, i * batch, batch)
        cx, cy, cz = decode(cids)
        vals, gx, gy, gz = corner_data(cids)
        in_range = (i * batch + slot_base) < n_cells
        inside = vals < iso
        vi = vals[:, pair_i_np]
        vj = vals[:, pair_j_np]
        ghost = jnp.stack([cx == R - 1, cy == R - 1, cz == R - 1],
                          axis=-1)                              # [B,3]
        aliased = jnp.any(ghost[:, None, :] & bad[None, :, :], axis=-1)
        cross = (inside[:, pair_i_np] != inside[:, pair_j_np]) \
            & in_range[:, None] & ~aliased
        dv = vj - vi
        t = jnp.where(jnp.abs(dv) > 1e-12, (iso - vi) / dv, 0.5)
        t = jnp.clip(t, 0.0, 1.0)[..., None]

        def world(gxx, gyy, gzz):
            return jnp.stack([
                lo[0] + gxx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
                lo[1] + gyy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
                lo[2] + gzz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
            ], axis=-1)

        pi = world(gx[:, pair_i_np], gy[:, pair_i_np], gz[:, pair_i_np])
        pj = world(gx[:, pair_j_np], gy[:, pair_j_np], gz[:, pair_j_np])
        pos = pi + t * (pj - pi)  # [B,D,3]
        return vals, cross, pos

    vals_s, cross_s, pos_s = jax.lax.map(
        vbatch, jnp.arange(n_iter, dtype=jnp.int32))
    crossf = cross_s.reshape(-1)
    csum = jnp.cumsum(crossf.astype(jnp.int32))
    nv = csum[-1]
    nv_cap = n_iter * batch * D
    vidx = jnp.where(crossf, csum - 1, nv_cap)
    verts = jnp.zeros((nv_cap, 3), jnp.float32).at[vidx].set(
        pos_s.reshape(-1, 3), mode="drop")

    # dense owner table: packed vstart*2^D + crossmask per extended cell
    ex = (csum - crossf.astype(jnp.int32)).reshape(n_iter * batch, D)
    vstart = ex[:, 0]
    maskbits = jnp.sum(
        cross_s.reshape(n_iter * batch, D).astype(jnp.int32)
        * (1 << jnp.arange(D, dtype=jnp.int32))[None, :], axis=1)
    packed = vstart * (1 << D) + maskbits
    all_ids = cell_ids[:n_iter * batch]
    slot_valid = jnp.arange(n_iter * batch, dtype=jnp.int32) < n_cells
    vtable = jnp.zeros((E ** 3,), jnp.int32).at[
        jnp.where(slot_valid, all_ids, E ** 3)].set(packed, mode="drop")
    # zero pad on high: out-of-range neighbors (only referenced by masked
    # slots) read packed=0 instead of aliasing a real cell
    vtpack = _pack8(jnp.pad(vtable.reshape(E, E, E), ((0, 1),) * 3), E)

    # ---- pass 2: triangles -> welded vertex indices ----
    counts_j = jnp.asarray(_tables()[1].astype(np.float32))     # [6,16]
    nb_f = jnp.asarray(nb_tbl.reshape(6, 16, 6).astype(np.float32))
    dir_f = jnp.asarray(dir_tbl.reshape(6, 16, 6).astype(np.float32))
    weights = jnp.asarray([1, 2, 4, 8], jnp.int32)
    powD = (1 << jnp.arange(D, dtype=jnp.int32))

    def tbatch(i):
        cids = jax.lax.dynamic_slice_in_dim(cell_ids, i * batch, batch)
        cx, cy, cz = decode(cids)
        vals = vals_s[i]
        inside = (vals < iso).astype(jnp.int32)
        case = jnp.sum(inside[:, tets] * weights, axis=-1)       # [B,6]
        case_oh = (case[..., None]
                   == jnp.arange(16, dtype=jnp.int32)).astype(jnp.float32)
        n_tris = jnp.einsum("mgc,gc->mg", case_oh, counts_j
                            ).round().astype(jnp.int32)          # [B,6]
        nb = jnp.einsum("mgc,gcd->mgd", case_oh, nb_f
                        ).round().astype(jnp.int32)              # [B,6,12]
        dr = jnp.einsum("mgc,gcd->mgd", case_oh, dir_f
                        ).round().astype(jnp.int32)
        nb = nb.reshape(batch, 6, 2, 3)
        dr = dr.reshape(batch, 6, 2, 3)

        # one ROW gather of the 8 neighbor owner cells per cell, then
        # per-vertex one-hot select over the tiny 8-axis
        packed8 = jnp.take(vtpack, cids, axis=0)                 # [B,8] i32
        # packed reaches vstart*2^D ~ 2^29 — beyond f32's exact-integer
        # range, so select with INTEGER one-hot arithmetic, not an einsum
        nb_oh = (nb[..., None]
                 == jnp.arange(8, dtype=jnp.int32)).astype(jnp.int32)
        pk = jnp.sum(nb_oh * packed8[:, None, None, None, :],
                     axis=-1)                                    # [B,6,2,3]
        vst = pk // (1 << D)
        msk = pk % (1 << D)
        bits = (msk[..., None] // powD) % 2                      # [...,D]
        below = (jnp.arange(D, dtype=jnp.int32) < dr[..., None])
        rank = jnp.sum(bits * below, axis=-1)
        tvidx = vst + rank                                       # [B,6,2,3]

        slot2 = jnp.arange(2, dtype=jnp.int32)
        valid = slot2[None, None, :] < n_tris[..., None]         # [B,6,2]
        real = ((cx <= R - 2) & (cy <= R - 2) & (cz <= R - 2)
                & ((i * batch + slot_base) < n_cells))
        valid = valid & real[:, None, None]
        return (tvidx.reshape(batch, 12, 3), valid.reshape(batch, 12))

    tv_s, tvalid_s = jax.lax.map(tbatch, jnp.arange(n_iter, dtype=jnp.int32))
    tflat = tvalid_s.reshape(-1)
    tcs = jnp.cumsum(tflat.astype(jnp.int32))
    ntri = tcs[-1]
    tcap = n_iter * batch * 12
    tidx = jnp.where(tflat, tcs - 1, tcap)
    faces = jnp.zeros((tcap, 3), jnp.int32).at[tidx].set(
        tv_s.reshape(-1, 3), mode="drop")
    return verts, nv, faces, ntri


def _pow2b(n: int) -> int:
    out = 1
    while out < n:
        out *= 2
    return out


def _qbucket(n: int) -> int:
    """Quarter-pow2 bucket (<=14.3% overshoot): fetch sizes recompile only
    the tiny slice/pack jits, so finer buckets are nearly free and cut the
    transferred bytes vs plain pow2 (up to 2x overshoot)."""
    p = _pow2b(max(n, 4)) // 2
    for m in (5, 6, 7, 8):
        if n <= p * m // 4:
            return p * m // 4
    return 2 * p


def _ebucket(n: int) -> int:
    """Eighth-pow2 bucket (<=6.7% overshoot) for the FINE-PASS block count:
    every padded block is 512 cells x 64 pts of dead MXU work in the
    dominant kernel (~1.1 ms/block at 257^3), so the finer step pays for
    its extra jit variants there; fetch-side buckets stay quarter-pow2."""
    p = _pow2b(max(n, 4)) // 2
    for m in range(9, 17):
        if n <= p * m // 8:
            return p * m // 8
    return 2 * p


@functools.partial(jax.jit, static_argnames=("n",))
def _slice_rows(buf, n: int):
    return jax.lax.slice_in_dim(buf, 0, n)


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def _slice_span(buf, lo: int, hi: int):
    return jax.lax.slice_in_dim(buf, lo, hi)


_FETCH_POOL = None
_FETCH_POOL_LOCK = threading.Lock()  # module-import time: no race on the
# lock itself (double-checked locking on a lazily-created lock can leak a
# second pool's threads)


def _get_fetch_pool():
    global _FETCH_POOL
    with _FETCH_POOL_LOCK:
        if _FETCH_POOL is None:
            from concurrent.futures import ThreadPoolExecutor
            # 12 workers: every in-flight fetch should own a worker. Each
            # fetch pays a ~26 ms tunnel HANDSHAKE whether it is 40 KB or
            # 400, and a stream that has to WAIT for a worker queues into
            # a second full-RTT round (probe_e2e_breakdown: recs landed
            # 23 ms after flags on the old 6-worker pool). Sized for the
            # chunked single-image layout (11 streams) and the masked
            # farm at depth 2 (6 x 2); MORE measured worse — a 36-worker
            # pool cost +36 ms/img of pure thread churn on the 1-core
            # farm host (probe_farm_breakdown round 4b).
            _FETCH_POOL = ThreadPoolExecutor(12)
    return _FETCH_POOL


def _fetch_parallel(buf_d, parts: int = 4) -> np.ndarray:
    """Device->host transfer as `parts` concurrent slice fetches: the axon
    tunnel serializes a single array fetch at ~22 MB/s but sustains ~52 MB/s
    across >=4 concurrent streams (measured; x2 does not help). Slice bounds
    are static per bucketed shape, so the tiny slice jits cache."""
    n = int(buf_d.shape[0])
    if n < 1 << 18:  # small: RTT-bound, one stream
        return np.asarray(buf_d)
    pool = _get_fetch_pool()
    bounds = [i * n // parts for i in range(parts)] + [n]
    slices = [_slice_span(buf_d, bounds[i], bounds[i + 1])
              for i in range(parts)]
    out = list(pool.map(np.asarray, slices))
    return np.concatenate(out)


_PACK_F0 = 21  # face-index field widths: f0 21b | f1 21b | f2 22b over 2 u32
_PACK_F1LO = 11


@functools.partial(jax.jit, static_argnames=("nv_b", "nt_b"))
def _pack_mesh(verts, faces, sdf_params, nv_b: int, nt_b: int):
    """One-transfer mesh encoding for the ~28 MB/s tunnel: vertices as
    bbox-normalized u16 fixed point (error <= span/131070 ~ 1.5e-5, far
    below the 1/(R-1) cell size), faces as 21/21/22-bit fields in 2 u32.
    Everything concatenates into a single u32 buffer (a device->host fetch
    costs ~25 ms latency alone)."""
    lo = sdf_params[0:3]
    hi = sdf_params[3:6]
    v = jax.lax.slice_in_dim(verts, 0, nv_b)
    q = jnp.clip((v - lo) / (hi - lo) * 65535.0 + 0.5,
                 0.0, 65535.0).astype(jnp.uint16).reshape(-1)
    if q.shape[0] % 2:
        q = jnp.concatenate([q, jnp.zeros((1,), jnp.uint16)])
    qw = jax.lax.bitcast_convert_type(q.reshape(-1, 2), jnp.uint32)
    f = jax.lax.slice_in_dim(faces, 0, nt_b).astype(jnp.uint32)
    w0 = f[:, 0] | ((f[:, 1] & ((1 << _PACK_F1LO) - 1)) << _PACK_F0)
    w1 = (f[:, 1] >> _PACK_F1LO) | (f[:, 2] << (21 - _PACK_F1LO))
    return jnp.concatenate([qw, jnp.stack([w0, w1], -1).reshape(-1)])


def _unpack_mesh(buf: np.ndarray, sdf_params, nv_b: int, nt_b: int, nv: int,
                 ntri: int) -> tuple[np.ndarray, np.ndarray]:
    nq = (nv_b * 3 + 1) // 2
    q = buf[:nq].view(np.uint16)[:nv * 3].reshape(nv, 3).astype(np.float32)
    lo = np.asarray(sdf_params[0:3], np.float32)
    hi = np.asarray(sdf_params[3:6], np.float32)
    verts = lo + q / np.float32(65535.0) * (hi - lo)
    w = buf[nq:].reshape(nt_b, 2)[:ntri]
    f0 = w[:, 0] & ((1 << _PACK_F0) - 1)
    f1 = (w[:, 0] >> _PACK_F0) | ((w[:, 1] & ((1 << (_PACK_F0 - _PACK_F1LO))
                                              - 1)) << _PACK_F1LO)
    f2 = w[:, 1] >> (_PACK_F0 - _PACK_F1LO)
    return verts, np.stack([f0, f1, f2], -1).astype(np.int32)


def _tq_bits(R: int) -> int:
    """Edge-parameter quantization: u8 once a cell is <= 1/128 of the bbox
    (vertex error <= cell/255 ~ 3e-5 of the bbox at R=129, 1.5e-5 at 257 —
    the same error class the packed-u16-world-coordinate transfer had);
    u16 at small/test grids keeps the record path bit-tight there."""
    return 8 if R - 1 >= 128 else 16


def _dense_record_words(volume: jnp.ndarray, iso: float) -> list:
    """Pack imask + the D owned-edge t parameters DENSELY into flat i32
    word arrays [E^3] (u8 tq: 2 words — tq0..3 | tq4..6+imask<<24; u16 tq:
    4 words). The 7 corner-shifted reads are fused slice reads of the
    edge-padded volume COMBINED BY INTEGER ARITHMETIC into flat words — no
    [.., 8]-minor stack ever materializes (that relayout is the ~17 ms
    _pack8 trap; this build measured 0.94 ms at 257^3)."""
    pair_i_np, pair_j_np, _, _ = _owned_tables()
    D = len(pair_i_np)
    assert (m := CORNERS[pair_i_np]).max() == 0 and D == 7, m  # all from c0
    R = volume.shape[0]
    E = R
    vp = jnp.pad(volume, ((0, 1),) * 3, mode="edge")

    def sh(ox, oy, oz):
        return jax.lax.slice(vp, (oz, oy, ox), (oz + E, oy + E, ox + E))

    v0 = sh(0, 0, 0)
    imask = (v0 < iso).astype(jnp.int32)  # corner 0 = bit 0
    scale = 255.0 if _tq_bits(R) == 8 else 65535.0
    tq = []
    for d in range(D):
        ox, oy, oz = CORNERS[pair_j_np[d]].tolist()
        vj = sh(ox, oy, oz)
        k = int(pair_j_np[d])
        imask = imask | ((vj < iso).astype(jnp.int32) << k)
        dv = vj - v0
        t = jnp.where(jnp.abs(dv) > 1e-12, (iso - v0) / dv, 0.5)
        tq.append(jnp.round(jnp.clip(t, 0.0, 1.0) * scale)
                  .astype(jnp.int32))
    if _tq_bits(R) == 8:
        words = [tq[0] | (tq[1] << 8) | (tq[2] << 16) | (tq[3] << 24),
                 tq[4] | (tq[5] << 8) | (tq[6] << 16) | (imask << 24)]
    else:
        words = [tq[0] | (tq[1] << 16), tq[2] | (tq[3] << 16),
                 tq[4] | (tq[5] << 16), tq[6] | (imask << 16)]
    return [w.reshape(-1) for w in words]


def _sparse_cell_words(rows_flat: jnp.ndarray, cell_ids: jnp.ndarray,
                       count: jnp.ndarray, vol_c: jnp.ndarray, *,
                       stride: int, R: int, iso: float):
    """SPARSE record words + change bits straight from the fine kernel's
    per-cell output — the dense [R^3] volume never materializes (round 5:
    its ~7 ms per-point value scatter, ~2 ms full-volume change scan and
    ~1 ms upsample were the biggest non-roofline device items; everything
    the records/scan need lives in the active blocks).

    rows_flat [n_kcells*64] f32: decode_cells output (cell-major, z-major
    in-block order — the same l = z*16+y*4+x as the scan bits and
    _cell_points). cell_ids [n_kcells] coarse-cell ids, valid < count.

    Per active block, a [5,5,5] value patch V is assembled with the exact
    dense-path precedence: own kernel values, +1 halo from neighbor kernel
    rows where the neighbor is active, else the coarse trilinear — the
    SAME lo*(1-w)+hi*w arithmetic as infer/sparse._upsample_aligned, so
    every patch value is bit-equal to the dense volume's. All shifted
    reads are then static slices of V.

    REQUIRES no active cell on the +boundary (ghost blocks and exact
    boundary planes stay out of the patch model): callers add n_boundary
    to the guard so boundary scenes take the dense flow. Returns
    (words, bits [B3^3,2], cand [B3^3] bool, own_tbl [c^3] i32,
    guard i32 — coarse mixed-sign non-active cells + kernel-vs-lerp sign
    mismatches on low faces readable by non-active blocks; == 0 exactly
    when the dense flow's missed-change guard would be 0 too, see
    _compact_block_bits)."""
    S = stride
    assert S == 4, S
    c = (R - 1) // S
    B3 = c + 1
    rc = c + 1
    NK = cell_ids.shape[0]
    f32 = jnp.float32
    valid = jnp.arange(NK, dtype=jnp.int32) < count
    czc = cell_ids // (c * c)
    cyc = (cell_ids // c) % c
    cxc = cell_ids % c

    own_tbl = jnp.full((c ** 3,), -1, jnp.int32).at[
        jnp.where(valid, cell_ids, c ** 3)].set(
        jnp.arange(NK, dtype=jnp.int32), mode="drop")
    act3 = jnp.zeros((c ** 3,), bool).at[
        jnp.where(valid, cell_ids, c ** 3)].set(True, mode="drop")

    # GATHER PACKING (all per-cell lookups below address tiny dense
    # tables, and TPU gathers cost per ROW whatever the row holds — 22
    # scalar gathers x 18k cells measured ~12 ms, the whole win gone; one
    # aligned row gather per table is ~10x cheaper. The [c^3, 8]-minor
    # stacks are the _pack8 relayout at 64^3 scale: ~0.3 ms, not 17.)
    #   vc8: the 8 coarse corner values per cell
    #   nb8: the kernel slot of self + the 7 "+1" neighbors (-1 absent)
    #   cov: bit d = the "-1" neighbor in direction d is active or
    #        out-of-grid (no lerp reader blocks there — guard mask)
    def sh8(v3, pad_val):
        p = jnp.pad(v3, ((0, 1),) * 3, mode="constant",
                    constant_values=pad_val)
        return jnp.stack(
            [jax.lax.slice(p, (dz, dy, dx), (dz + c, dy + c, dx + c))
             .reshape(-1)
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], axis=-1)

    # vol_c is [rc,rc,rc]: the +1 corners are real data, no pad needed
    vc8 = jnp.stack(
        [jax.lax.slice(vol_c, (dz, dy, dx), (dz + c, dy + c, dx + c))
         .reshape(-1)
         for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
        axis=-1)                              # [c^3, 8] (k = dz*4+dy*2+dx)
    nb8 = sh8(own_tbl.reshape(c, c, c), -1)   # [c^3, 8] (same k order)
    apad = jnp.pad(act3.reshape(c, c, c), ((1, 0),) * 3, mode="constant",
                   constant_values=True)
    cov = jnp.zeros((c ** 3,), jnp.int32)
    mdirs = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1),
             (0, 1, 1), (1, 1, 1)]
    for d, (dx, dy, dz) in enumerate(mdirs):
        sl = jax.lax.slice(apad, (1 - dz, 1 - dy, 1 - dx),
                           (1 - dz + c, 1 - dy + c, 1 - dx + c))
        cov = cov | (sl.reshape(-1).astype(jnp.int32) << d)

    gid = jnp.where(valid, cell_ids, 0)
    corn8 = jnp.take(vc8, gid, axis=0)                       # [NK, 8]
    slot8 = jnp.take(nb8, gid, axis=0)                       # [NK, 8]
    cov_r = jnp.take(cov, gid)                               # [NK]

    # ---- everything below runs in [NK, 64] lane form: a [NK,5,5,5]
    # patch has a 5-element minor dim, which Mosaic tiles at 5/128 lane
    # efficiency (~25x padded memory) — the patch version of this builder
    # measured ~16 ms at production counts, the lane form ~3. Neighbor
    # values are masked LANE SHIFTS of own/neighbor rows; coarse lerp is
    # the same chained lo*(1-w)+hi*w as _upsample_aligned with static
    # per-lane weights, so every value stays bit-equal to the dense
    # volume's. ----
    li = np.arange(S ** 3, dtype=np.int32)
    lx_np, ly_np, lz_np = li % 4, (li // 4) % 4, li // 16
    rows2 = rows_flat.reshape(NK, S ** 3)

    def vcorn(dz, dy, dx):
        return corn8[:, dz * 4 + dy * 2 + dx]

    def lerp1(lo, hi, w):
        return lo * (1 - w) + hi * w

    def lerp_dir(ox, oy, oz):
        """Coarse trilinear at every lane's target point (comp+o)/4 —
        the exact per-point expression chain of _upsample_aligned."""
        wz = jnp.asarray((lz_np + oz).astype(np.float32) / 4.0)[None, :]
        wy = jnp.asarray((ly_np + oy).astype(np.float32) / 4.0)[None, :]
        wx = jnp.asarray((lx_np + ox).astype(np.float32) / 4.0)[None, :]
        az = [[lerp1(vcorn(0, dy, dx)[:, None], vcorn(1, dy, dx)[:, None],
                     wz) for dx in (0, 1)] for dy in (0, 1)]
        ay = [lerp1(az[0][dx], az[1][dx], wy) for dx in (0, 1)]
        return lerp1(ay[0], ay[1], wx)                       # [NK, 64]

    def lsh(a, s):
        """out[:, l] = a[:, l + s] (zero-filled; callers mask)."""
        if s == 0:
            return a
        if s > 0:
            return jnp.pad(a[:, s:], ((0, 0), (0, s)))
        return jnp.pad(a[:, :s], ((0, 0), (-s, 0)))

    nb_rows = {}
    for k, (dz, dy, dx) in enumerate([(z, y, x) for z in (0, 1)
                                      for y in (0, 1) for x in (0, 1)]):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        slot = slot8[:, k]
        nb_rows[(dx, dy, dz)] = (
            jnp.take(rows2, jnp.maximum(slot, 0), axis=0),
            ((slot >= 0) & valid)[:, None])

    def build_vj(ox, oy, oz):
        """Values at every cell's (l + offset) target: own/neighbor kernel
        rows where the owning block is active, coarse lerp otherwise —
        the dense volume's exact write precedence (no boundary planes:
        n_boundary > 0 rides the guard)."""
        vj = lerp_dir(ox, oy, oz)
        axes = [a for a in range(3) if (ox, oy, oz)[a]]
        comp = (lx_np, ly_np, lz_np)
        step = (1, 4, 16)
        for nsub in range(1 << len(axes)):
            sub = [axes[i] for i in range(len(axes)) if (nsub >> i) & 1]
            lane = np.ones(S ** 3, bool)
            corr = [0, 0, 0]
            for a in axes:
                if a in sub:
                    lane &= comp[a] == 3
                    corr[a] = 1
                else:
                    lane &= comp[a] < 3
            shift = (ox * 1 + oy * 4 + oz * 16
                     - 4 * (corr[0] * 1 + corr[1] * 4 + corr[2] * 16))
            if not sub:
                src, ok = rows2, valid[:, None]
            else:
                src, ok = nb_rows[(corr[0], corr[1], corr[2])]
            vj = jnp.where(jnp.asarray(lane)[None, :] & ok,
                           lsh(src, shift), vj)
        return vj

    # ---- words: same arithmetic as _dense_record_words ----
    pair_i_np, pair_j_np, _, _ = _owned_tables()
    D = len(pair_i_np)
    assert (CORNERS[pair_i_np]).max() == 0 and D == 7
    lerp0 = lerp_dir(0, 0, 0)
    v0 = rows2
    imask = (v0 < iso).astype(jnp.int32)
    scale = 255.0 if _tq_bits(R) == 8 else 65535.0
    tq = []
    for d in range(D):
        ox, oy, oz = CORNERS[pair_j_np[d]].tolist()
        vj = build_vj(ox, oy, oz)
        k = int(pair_j_np[d])
        imask = imask | ((vj < iso).astype(jnp.int32) << k)
        dv = vj - v0
        t = jnp.where(jnp.abs(dv) > 1e-12, (iso - v0) / dv, 0.5)
        tq.append(jnp.round(jnp.clip(t, 0.0, 1.0) * scale)
                  .astype(jnp.int32))
    if _tq_bits(R) == 8:
        words = [tq[0] | (tq[1] << 8) | (tq[2] << 16) | (tq[3] << 24),
                 tq[4] | (tq[5] << 8) | (tq[6] << 16) | (imask << 24)]
    else:
        words = [tq[0] | (tq[1] << 16), tq[2] | (tq[3] << 16),
                 tq[4] | (tq[5] << 16), tq[6] | (imask << 16)]
    words = [w.reshape(NK * S ** 3) for w in words]

    # ---- change bits: a cell crosses iff its 8 corner signs disagree —
    # exactly imask not all-zero / all-one (bit-identical to
    # _sign_change_cells' any/all over the same corner values) ----
    change = (imask != 0) & (imask != 0xFF) & valid[:, None]
    wpk = np.zeros((S ** 3, 4), np.float32)
    for i in range(S ** 3):
        wpk[i, i // 16] = 2.0 ** (i % 16)
    dig = jnp.dot(change.astype(f32), jnp.asarray(wpk),
                  preferred_element_type=f32).astype(jnp.int32)
    blo_r = dig[:, 0] | (dig[:, 1] << 16)
    bhi_r = dig[:, 2] | (dig[:, 3] << 16)
    b3id = (czc * B3 + cyc) * B3 + cxc
    tgt = jnp.where(valid, b3id, B3 ** 3)
    blo = jnp.zeros((B3 ** 3,), jnp.int32).at[tgt].set(blo_r, mode="drop")
    bhi = jnp.zeros((B3 ** 3,), jnp.int32).at[tgt].set(bhi_r, mode="drop")
    bits = jnp.stack([blo, bhi], axis=-1)
    cand = jnp.zeros((B3 ** 3,), bool).at[tgt].set(True, mode="drop")

    # ---- soundness guard (the dense flow's missed-change equivalent) ----
    # (1) a mixed-corner-sign coarse cell outside the active set: its
    # interior lerp crosses iso in a non-candidate block (uniform-sign
    # trilinear cannot cross) — _active_cells makes these active, so this
    # fires only on band-premise violations, exactly like dense `missed`.
    chg_c = _sign_change_cells(vol_c, iso)[:c, :c, :c].reshape(-1)
    guard = jnp.sum((chg_c & ~act3).astype(jnp.int32))
    # (2) kernel-vs-lerp sign mismatch at a low-face point read by a
    # non-active block's cells: the only way a change cell can hide in a
    # block the candidate set doesn't cover (its other corners are
    # uniform-sign lerp by (1)).
    mm = (rows2 < iso) != (lerp0 < iso)                      # [NK, 64]

    def mact(d):  # cov bit d: -dir neighbor active or out-of-grid
        return (((cov_r >> d) & 1) > 0)[:, None]

    a_x, a_y, a_z = mact(0), mact(1), mact(2)
    a_xy, a_xz, a_yz = mact(3), mact(4), mact(5)
    a_xyz = mact(6)
    ex = jnp.asarray(lx_np == 0)[None, :]
    ey = jnp.asarray(ly_np == 0)[None, :]
    ez = jnp.asarray(lz_np == 0)[None, :]
    # face x=0 lanes: readers -x, -xy (y==0), -xz (z==0), -xyz (both)
    badx = ex & (~a_x | (ey & ~a_xy) | (ez & ~a_xz) | (ey & ez & ~a_xyz))
    bady = ey & (~a_y | (ex & ~a_xy) | (ez & ~a_yz) | (ex & ez & ~a_xyz))
    badz = ez & (~a_z | (ex & ~a_xz) | (ey & ~a_yz) | (ex & ey & ~a_xyz))
    guard = guard + jnp.sum(
        (mm & (badx | bady | badz) & valid[:, None]).astype(jnp.int32))
    return words, bits, cand, own_tbl, guard


def _records_from_words_sparse(words: list, sids: jnp.ndarray,
                               n_cells: jnp.ndarray, R: int):
    """(rec, tq) for slots whose ids address the SPARSE words arrays
    (slot*64 + bit, see _compact_block_bits srow_tbl). The dense twin's
    ghost aliasing is unnecessary here: the sparse flow guards out
    boundary-touching actives entirely (no ghost cells ever get slots),
    and clamped +1 reads inside the patch already yield cross=0."""
    pair_i_np, pair_j_np, _, _ = _owned_tables()
    D = len(pair_i_np)
    S = sids.shape[0]
    rows = [jnp.take(w, sids) for w in words]
    if _tq_bits(R) == 8:
        r0, r1 = rows
        imask = (r1 >> 24) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFF, (r0 >> 8) & 0xFF,
                        (r0 >> 16) & 0xFF, (r0 >> 24) & 0xFF,
                        (r1 >> 0) & 0xFF, (r1 >> 8) & 0xFF,
                        (r1 >> 16) & 0xFF], axis=-1).astype(jnp.uint8)
    else:
        r0, r1, r2, r3 = rows
        imask = (r3 >> 16) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFFFF, (r0 >> 16) & 0xFFFF,
                        (r1 >> 0) & 0xFFFF, (r1 >> 16) & 0xFFFF,
                        (r2 >> 0) & 0xFFFF, (r2 >> 16) & 0xFFFF,
                        (r3 >> 0) & 0xFFFF], axis=-1).astype(jnp.uint16)
    in_range = jnp.arange(S, dtype=jnp.int32) < n_cells
    bitj = (imask[:, None] >> jnp.asarray(pair_j_np)[None, :]) & 1
    cross = ((imask[:, None] & 1) != bitj) & in_range[:, None]
    cmask = jnp.sum(cross.astype(jnp.int32)
                    * (1 << jnp.arange(D, dtype=jnp.int32))[None, :],
                    axis=1)
    rec = ((cmask << 8) | imask).astype(jnp.uint16)
    return rec, tq


@functools.partial(jax.jit, static_argnames=("iso", "n_iter", "batch"))
def _extract_records(volume: jnp.ndarray, cell_ids: jnp.ndarray,
                     n_cells: jnp.ndarray, *, iso: float, n_iter: int,
                     batch: int):
    """Slot-dense owned-edge RECORDS: per active-cell slot, the 8-corner
    inside mask, the (alias-suppressed) crossing-direction mask, and each
    crossing edge's interpolation parameter quantized to u16 of the edge
    length at small grids / u8 at production grids (see _tq_bits; the u8
    transfer is ~35% fewer record bytes over the ~50 MB/s tunnel).

    DENSE-PRECOMPUTE + ROW GATHER (round 4): the per-slot work was 8
    scalar corner gathers — 656k gather rows at ~82k production slots,
    ~9 ms by the ~14 ns/row TPU gather law, the whole stage's cost
    (probe_recstage_slope). Instead imask + all D t parameters are
    computed DENSELY over the volume (fused shifted slice reads packed
    into flat i32 words by integer arithmetic — 0.94 ms at 257^3, no
    minor-dim relayout) and each slot gathers ONE packed word per array
    (2x82k rows, 0.17 ms). Measured 8.97 -> 2.11 ms with BIT-IDENTICAL
    (rec, tq) on every slot (scripts/probe_dense_records.py); costs a
    transient [E^3] x 8B (u8 mode) HBM scratch — 136 MB at 257^3.

    No compaction, no scatter, no output-size sync: shapes depend only on
    (n_iter, batch), so the host fetches immediately and assembles
    verts+faces off the device's critical path (assemble_mesh_np oracle /
    native C fast path). Returns (rec u16 [S] = crossmask<<8 | insidemask,
    tq u8|u16 [S, D])."""
    words = _dense_record_words(volume, iso)
    S = n_iter * batch
    cids = jax.lax.slice_in_dim(cell_ids, 0, S)
    return _records_from_words(words, cids, n_cells, volume.shape[0])


def _records_from_words(words: list, cids: jnp.ndarray,
                        n_cells: jnp.ndarray, R: int):
    """(rec, tq) for the slots in `cids` given the dense packed words.
    n_cells is RELATIVE to cids[0]'s global slot (callers of a chunk at
    global slot `start` pass n_cells - start, like the sharded worker)."""
    pair_i_np, pair_j_np, _, _ = _owned_tables()
    D = len(pair_i_np)
    E = R
    S = cids.shape[0]
    bad = jnp.asarray((CORNERS[pair_i_np] | CORNERS[pair_j_np]) > 0)
    rows = [jnp.take(w, cids) for w in words]
    if _tq_bits(R) == 8:
        r0, r1 = rows
        imask = (r1 >> 24) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFF, (r0 >> 8) & 0xFF,
                        (r0 >> 16) & 0xFF, (r0 >> 24) & 0xFF,
                        (r1 >> 0) & 0xFF, (r1 >> 8) & 0xFF,
                        (r1 >> 16) & 0xFF], axis=-1).astype(jnp.uint8)
    else:
        r0, r1, r2, r3 = rows
        imask = (r3 >> 16) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFFFF, (r0 >> 16) & 0xFFFF,
                        (r1 >> 0) & 0xFFFF, (r1 >> 16) & 0xFFFF,
                        (r2 >> 0) & 0xFFFF, (r2 >> 16) & 0xFFFF,
                        (r3 >> 0) & 0xFFFF], axis=-1).astype(jnp.uint16)
    in_range = jnp.arange(S, dtype=jnp.int32) < n_cells
    cz = cids // (E * E)
    cy = (cids // E) % E
    cx = cids % E
    ghost = jnp.stack([cx == R - 1, cy == R - 1, cz == R - 1], axis=-1)
    aliased = jnp.any(ghost[:, None, :] & bad[None, :, :], axis=-1)
    bitj = (imask[:, None] >> jnp.asarray(pair_j_np)[None, :]) & 1
    # NB: like the pre-round-4 gather path, imask is NOT masked by
    # in_range — padded slots carry cell 0's inside mask with cmask 0
    # (assemblers only read slots with crossings; bit-parity preserved)
    cross = ((imask[:, None] & 1) != bitj) & in_range[:, None] & ~aliased
    cmask = jnp.sum(cross.astype(jnp.int32)
                    * (1 << jnp.arange(D, dtype=jnp.int32))[None, :],
                    axis=1)
    # cmask(<=7b)<<8 | imask(8b) fits u16: halves the rec stream's
    # bytes over the ~50 MB/s tunnel (host assemblers cast to u32)
    rec = ((cmask << 8) | imask).astype(jnp.uint16)
    return rec, tq


def make_sharded_records_fn(mesh, R: int, *, iso: float, n_iter: int,
                            batch: int = 8192):
    """Multi-chip record pass: cell-slot batches striped over the mesh
    'points' axis (every slot is independent given the volume — SURVEY §2.9
    P3 applied to mesh extraction). Volume and cell list are replicated;
    each device emits records for its stripe; host assembly is unchanged.
    n_iter must divide evenly over the axis (caller buckets it)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from disn_tpu.parallel.mesh import POINT_AXIS

    n_dev = mesh.shape[POINT_AXIS]
    per_dev = -(-n_iter // n_dev)

    def worker(volume, cell_ids, n_cells):
        dev = jax.lax.axis_index(POINT_AXIS)
        start = dev * per_dev * batch
        my_ids = jax.lax.dynamic_slice_in_dim(cell_ids, start,
                                              per_dev * batch)
        # slot indices are global: shift the in-range test by the stripe
        rec, tq = _extract_records(volume, my_ids,
                                   jnp.maximum(n_cells - start, 0),
                                   iso=iso, n_iter=per_dev, batch=batch)
        return rec[None], tq[None]

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(POINT_AXIS), P(POINT_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def fn(volume, cell_ids, n_cells):
        rec, tq = sharded(volume, cell_ids, n_cells)
        return rec.reshape(-1), tq.reshape(rec.size, -1)

    return fn, per_dev * n_dev * batch


@jax.jit
def _count_cross(rec: jnp.ndarray) -> jnp.ndarray:
    """Total crossing edges (== vertex count) across all record slots."""
    return jnp.sum(jax.lax.population_count(rec.astype(jnp.int32) >> 8))


@functools.partial(jax.jit, static_argnames=("nvcap",))
def _compact_tq(rec: jnp.ndarray, tq: jnp.ndarray, nvcap: int
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Keep only the CROSSING edges' t parameters, in vertex order
    (slot-major, direction-minor — exactly the order the assemblers emit
    vertices), so the tq stream ships nv bytes instead of S*D (~2.5-3x
    fewer at production crossing densities). Returns (tqc [nvcap], nv);
    nv > nvcap means the bucket under-predicted — the caller re-runs the
    uncompacted path (rare: buckets carry a margin and repeat shapes)."""
    S, D = tq.shape
    cross = ((rec.astype(jnp.int32)[:, None]
              >> (8 + jnp.arange(D, dtype=jnp.int32))[None, :]) & 1) > 0
    flat = cross.reshape(-1)
    cs = jnp.cumsum(flat.astype(jnp.int32))
    idx = jnp.where(flat, cs - 1, nvcap)
    tqc = jnp.zeros((nvcap,), tq.dtype).at[idx].set(tq.reshape(-1),
                                                    mode="drop")
    return tqc, cs[-1]


_REC_CHUNKS = 4  # fetch-overlap chunk count for the record stage


_CHUNK_DESC = False  # descending (halving) chunk sizes vs near-equal (A/B)


def _chunk_bounds(n_iter: int, c: int | None = None
                  ) -> list[tuple[int, int]]:
    """Split n_iter record batches into <= c (default _REC_CHUNKS, read at
    call time so probes can A/B the count) contiguous chunks:
    [(start_iter, n_iters), ...]. Slot ranges are start*batch-based.

    _CHUNK_DESC=True halves sizes (20 iters -> [10, 5, 3, 2]) on the
    theory that the LAST chunk sits on the critical path; the interleaved
    TPU A/B (scripts/probe_ab_desc.py, round 5) measured it a clear LOSS —
    149.3 vs 107.2 ms median — because the fat first chunk delays every
    downstream fetch start and halves early stream concurrency (the
    >=4-stream aggregate-bandwidth law). Near-equal stays the default."""
    if c is None:
        c = _REC_CHUNKS
    c = max(1, min(c, n_iter))
    out = []
    s = 0
    rem = n_iter
    for k in range(c):
        if _CHUNK_DESC:
            sz = rem if k == c - 1 else max(1, min(-(-rem // 2),
                                                   rem - (c - 1 - k)))
        else:
            base, r = divmod(n_iter, c)
            sz = base + (1 if k < r else 0)
        out.append((s, sz))
        s += sz
        rem -= sz
    return out


def _chunk_nvs(rec: jnp.ndarray, n_iter: int, batch: int) -> list:
    """Per-chunk crossing counts at the _chunk_bounds slot ranges (device
    scalars) — seeds the NEXT image's per-chunk tqc bucket predictions."""
    pc = jax.lax.population_count(rec.astype(jnp.int32) >> 8)
    return [jnp.sum(jax.lax.slice_in_dim(pc, s * batch, (s + sz) * batch))
            for s, sz in _chunk_bounds(n_iter)]


@functools.partial(jax.jit,
                   static_argnames=("iso", "n_iter", "batch", "u8"))
def _records_masked_split(volume, cell_ids, n_cells, *, iso: float,
                          n_iter: int, batch: int, scalars=(),
                          u8: bool = True):
    """Record pass + fetch plan in ONE dispatch: tq pre-split in 3 (the
    five-stream fetch layout) and the crossing count, replacing a record
    jit + a count jit + 3 slice jits of per-image dispatch work on the
    single-core production host (~0.5 ms of python+enqueue each).

    scalars: upstream validation scalars (counts/escape/overflow flags) to
    embed in the returned flags vector — they then ride the record FETCH
    streams instead of a bare jax.device_get, whose ~25-40 ms round trip
    was the collect step's critical path. Returns
    (rec, tq0, tq1, tq2, flags i32[len(scalars)+1+chunks]) with
    flags[len(scalars)] = nv and flags[len(scalars)+1:] = the per-chunk
    crossing counts at the _chunk_bounds ranges (they seed the chunked
    compact path's tqc buckets for the next image)."""
    rec, tq = _extract_records(volume, cell_ids, n_cells, iso=iso,
                               n_iter=n_iter, batch=batch)
    S = n_iter * batch
    t0, t1 = S // 3, 2 * S // 3
    nv = _count_cross(rec)
    nvk = _chunk_nvs(rec, n_iter, batch)
    flags = jnp.stack([jnp.asarray(s, jnp.int32).reshape(())
                       for s in (*scalars, nv, *nvk)])
    # ship ONLY the inside mask (u8, default): the cross bits are host-
    # derivable from (inside, cell coords) — see _derive_recs — halving
    # the rec stream's tunnel bytes (~82 KB at production counts); u8=False
    # keeps the full u16 stream (A/B probes)
    if u8:
        rec = (rec & jnp.uint16(0xFF)).astype(jnp.uint8)
    return rec, tq[:t0], tq[t0:t1], tq[t1:], flags


@functools.partial(jax.jit, static_argnames=("R", "n_iter", "batch", "u8"))
def _records_masked_split_sparse(words, sids, n_cells, *, R: int,
                                 n_iter: int, batch: int, scalars=(),
                                 u8: bool = True):
    """_records_masked_split over the SPARSE words arrays (no dense
    volume; see _sparse_cell_words / _records_from_words_sparse). The
    emitted streams are byte-identical on every real slot."""
    S = n_iter * batch
    cids = jax.lax.slice_in_dim(sids, 0, S)
    rec, tq = _records_from_words_sparse(list(words), cids, n_cells, R)
    t0, t1 = S // 3, 2 * S // 3
    nv = _count_cross(rec)
    nvk = _chunk_nvs(rec, n_iter, batch)
    flags = jnp.stack([jnp.asarray(s, jnp.int32).reshape(())
                       for s in (*scalars, nv, *nvk)])
    if u8:
        rec = (rec & jnp.uint16(0xFF)).astype(jnp.uint8)
    return rec, tq[:t0], tq[t0:t1], tq[t1:], flags


@functools.partial(jax.jit,
                   static_argnames=("R", "start", "size", "nvcap", "u8"))
def _records_chunk_compact_sparse(words, sids, n_cells, *, R: int,
                                  start: int, size: int, nvcap: int,
                                  u8: bool = True):
    """_records_chunk_compact over the SPARSE words arrays."""
    cids = jax.lax.slice_in_dim(sids, start, start + size)
    rec, tq = _records_from_words_sparse(list(words), cids,
                                         jnp.maximum(n_cells - start, 0), R)
    tqc, nv = _compact_tq(rec, tq, nvcap)
    if u8:
        rec = (rec & jnp.uint16(0xFF)).astype(jnp.uint8)
    return rec, tqc, nv


def extract_mesh_records_deferred_sparse(words, R: int, sdf_params, sids,
                                         n_cells: int, blk, iso: float = 0.0,
                                         batch: int = 8192,
                                         join: bool = True):
    """extract_mesh_records_deferred for the sparse-words flow (seed and
    exact re-run paths): records straight from the words arrays, ids
    always reconstructed host-side from the blk stream."""
    if n_cells == 0:
        return lambda: (np.zeros((0, 3), np.float32),
                        np.zeros((0, 3), np.int32))
    n_iter, batch = records_n_iter(int(sids.shape[0]), n_cells, batch)
    assert n_iter * batch >= n_cells, (n_iter, batch, n_cells)
    rec_d, tq0, tq1, tq2, _ = _records_masked_split_sparse(
        tuple(words), sids, jnp.int32(n_cells), R=R, n_iter=n_iter,
        batch=batch)
    futs = records_submit((tq0, tq1, tq2, blk, rec_d))
    fin = records_finish_masked(futs, sdf_params, n_cells, R)
    if join:
        for f in futs:
            f.result()
    return fin


@functools.partial(jax.jit, static_argnames=("iso",))
def _dense_words_jit(volume, *, iso: float):
    """Standalone dense packed-word build (see _dense_record_words) so the
    chunked record path computes it ONCE and each chunk jit only gathers."""
    return tuple(_dense_record_words(volume, iso))


@functools.partial(jax.jit,
                   static_argnames=("R", "start", "size", "nvcap", "u8"))
def _records_chunk_compact(words, cell_ids, n_cells, *, R: int, start: int,
                           size: int, nvcap: int, u8: bool = True):
    """One slot-range chunk of the compact record stage: gather the packed
    words for global slots [start, start+size), compact ITS crossing-edge
    t params (vertex order is slot-major, so the concatenation of chunk
    tqc[:nv_k] slices reproduces the global compact stream exactly).
    Returns (rec_k u8 [size] — inside mask only, cross is host-derivable
    (_derive_recs); u8=False keeps u16 for A/B probes — tqc_k [nvcap],
    nv_k i32)."""
    cids = jax.lax.slice_in_dim(cell_ids, start, start + size)
    rec, tq = _records_from_words(list(words), cids,
                                  jnp.maximum(n_cells - start, 0), R)
    tqc, nv = _compact_tq(rec, tq, nvcap)
    if u8:
        rec = (rec & jnp.uint16(0xFF)).astype(jnp.uint8)
    return rec, tqc, nv


@jax.jit
def _flags_stack(vals):
    """Stack host/device scalars into one i32 flags vector (rides a fetch
    stream; one tiny jit per distinct length)."""
    return jnp.stack([jnp.asarray(v, jnp.int32).reshape(()) for v in vals])


@functools.partial(jax.jit,
                   static_argnames=("iso", "n_iter", "batch", "nvcap"))
def _records_compact_split(volume, cell_ids, n_cells, *, iso: float,
                           n_iter: int, batch: int, nvcap: int,
                           scalars=()):
    """Record pass + crossing-only tq compaction + fetch plan in ONE
    dispatch (see _records_masked_split / _compact_tq). Returns
    (rec0, rec1, tqc0, tqc1, flags) with flags[-1] = nv; nv > nvcap means
    the tqc stream is truncated and the caller must re-run uncompacted."""
    rec, tq = _extract_records(volume, cell_ids, n_cells, iso=iso,
                               n_iter=n_iter, batch=batch)
    tqc, nv = _compact_tq(rec, tq, nvcap)
    S = n_iter * batch
    flags = jnp.stack([jnp.asarray(s, jnp.int32).reshape(())
                       for s in (*scalars, nv)])
    return (rec[:S // 2], rec[S // 2:], tqc[:nvcap // 2], tqc[nvcap // 2:],
            flags)


def records_submit(parts):
    """Start the device->host fetch of already-split record buffers on the
    shared pool (>=4 concurrent streams sustain ~52 MB/s aggregate vs ~22
    single-stream on the tunnel). Returns futures in `parts` order."""
    pool = _get_fetch_pool()
    return [pool.submit(np.asarray, x) for x in parts]


def assemble_mesh_np(ids: np.ndarray, recs: np.ndarray, tqs: np.ndarray,
                     n_cells: int, R: int, sdf_params,
                     tq_compact: bool = False
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-numpy assembler for _extract_records output: the exact
    owned-edge vertex order (slot-major, direction-minor) and triangle
    tables the device two-pass extractor uses, so meshes are identical.
    Oracle for the native C fast path (native/meshassemble.cpp).

    tq_compact=True: tqs is the _compact_tq stream — one entry per
    CROSSING edge in vertex order, instead of [slots, D]."""
    pair_i, pair_j, nb_tbl, dir_tbl = _owned_tables()
    D = len(pair_i)
    E = R
    ids = np.asarray(ids[:n_cells], np.int64)
    recs = np.asarray(recs[:n_cells], np.uint32)
    tqs = np.asarray(tqs if tq_compact else tqs[:n_cells])
    if tqs.dtype == np.uint8:  # exact range map, see _tq_bits
        tqs = tqs.astype(np.uint16) * np.uint16(257)
    tqs = tqs.astype(np.uint16)
    cross = ((recs[:, None] >> (8 + np.arange(D, dtype=np.uint32))) & 1
             ).astype(bool)                                     # [n, D]
    inside = ((recs[:, None] >> np.arange(8, dtype=np.uint32)) & 1
              ).astype(np.int64)                                # [n, 8]
    counts = cross.sum(1)
    vstart = np.zeros(n_cells, np.int64)
    np.cumsum(counts[:-1], out=vstart[1:])
    nv = int(counts.sum())

    cz = ids // (E * E)
    cy = (ids // E) % E
    cx = ids % E
    lo = np.asarray(sdf_params[:3], np.float32)
    hi = np.asarray(sdf_params[3:6], np.float32)
    sel_cell, sel_dir = np.nonzero(cross)     # row-major == vertex order
    cc = np.stack([cx[sel_cell], cy[sel_cell], cz[sel_cell]], axis=1)
    gi = np.minimum(cc + CORNERS[pair_i[sel_dir]], R - 1)
    gj = np.minimum(cc + CORNERS[pair_j[sel_dir]], R - 1)
    pi = lo + gi.astype(np.float32) / (R - 1) * (hi - lo)
    pj = lo + gj.astype(np.float32) / (R - 1) * (hi - lo)
    if tq_compact:
        # vertex order == nonzero(cross) row-major == the compact stream
        t = tqs[:nv].astype(np.float32) / np.float32(65535.0)
    else:
        t = tqs[sel_cell, sel_dir].astype(np.float32) / np.float32(65535.0)
    verts = pi + t[:, None] * (pj - pi)
    assert len(verts) == nv

    # faces: table-driven per (cell, tet, slot), same winding as the device
    _, counts_tbl = _tables()                                    # [6,16]
    weights = 1 << np.arange(4)
    case = (inside[:, TETS] * weights).sum(-1)                   # [n, 6]
    n_tris = counts_tbl[np.arange(6)[None, :], case]             # [n, 6]
    real = (cx <= R - 2) & (cy <= R - 2) & (cz <= R - 2)
    valid = (np.arange(2)[None, None, :] < n_tris[:, :, None]) \
        & real[:, None, None]                                    # [n, 6, 2]
    nb = nb_tbl[np.arange(6)[None, :, None, None], case[:, :, None, None],
                np.arange(2)[None, None, :, None],
                np.arange(3)[None, None, None, :]]               # [n,6,2,3]
    dr = dir_tbl[np.arange(6)[None, :, None, None], case[:, :, None, None],
                 np.arange(2)[None, None, :, None],
                 np.arange(3)[None, None, None, :]]
    sc, st, sk = np.nonzero(valid)
    nb_v = nb[sc, st, sk]                                        # [T, 3]
    dr_v = dr[sc, st, sk]
    off = CORNERS[nb_v.reshape(-1)].astype(np.int64)             # [T*3, 3]
    base = np.stack([cx[sc], cy[sc], cz[sc]], 1)                 # [T, 3]
    ncell = np.repeat(base, 3, axis=0) + off
    nid = (ncell[:, 2] * E + ncell[:, 1]) * E + ncell[:, 0]
    # ids are group-compacted (ascending within 4^3 groups, not globally):
    # sort once for the owner lookup; vertex order stays slot order
    order = np.argsort(ids, kind="stable")
    pos = np.searchsorted(ids[order], nid)
    slot = order[np.minimum(pos, n_cells - 1)]
    # owners of a valid triangle's vertices are always in the list
    assert (ids[slot] == nid).all()
    below = (1 << dr_v.reshape(-1).astype(np.uint32)) - 1
    cmask = (recs[slot] >> np.uint32(8)) & np.uint32((1 << D) - 1)
    rank = np.zeros(len(slot), np.int64)
    masked = cmask & below
    for b in range(D):
        rank += (masked >> np.uint32(b)) & 1
    faces = (vstart[slot] + rank).reshape(-1, 3).astype(np.int32)
    return verts, faces


def _fit_batch(ids_len: int, batch: int) -> int:
    """Largest batch <= `batch` that divides the cell-id buffer length.
    _extract_records/_extract_owned slice cell_ids at i*batch with a
    CLAMPING dynamic_slice: a final partial batch would silently re-read
    shifted cells whose slot indices then disagree with the assembler
    (ids buffers are bcap*64 or bcap*8 with bcap a multiple of 128, so
    halving from 8192 terminates at a real divisor almost immediately)."""
    batch = max(1, min(batch, ids_len))
    while ids_len % batch:
        batch //= 2
    return batch


def _norm_gcap(E: int, gcap: int | None) -> int:
    if gcap is None:
        # surfaces cross O(R^2) cells, ~1/4 of a crossed 4^3 group's cells
        gcap = max(512, (E * E) // 4)
    return min(-(-gcap // 128) * 128, -(-((E + 3) // 4) ** 3 // 128) * 128)


def extract_mesh_from_ids(vol, sdf_params, ids, n_cells_d, n_cells: int,
                          iso: float = 0.0, gcap: int | None = None,
                          batch: int = 8192, packed: bool = True
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Owned-edge extraction given a PRECOMPUTED active-cell list (e.g. the
    one the sparse inference pass emits in the same jit as the volume —
    skips the standalone scan and its host sync). ids layout is
    _active_cells_ext's: [gcap*64] flat over the extended E^3 cell grid."""
    if n_cells == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    if gcap is None:
        gcap = _norm_gcap(int(vol.shape[0]), None)
    batch = _fit_batch(int(ids.shape[0]), batch)
    n_iter = min(_qbucket(max(1, -(-n_cells // batch))),
                 int(ids.shape[0]) // batch)
    verts_d, nv_d, faces_d, ntri_d = _extract_owned(
        vol, jnp.asarray(sdf_params, jnp.float32), ids, n_cells_d,
        iso=float(iso), n_iter=n_iter, batch=batch)
    nv, ntri = (int(x) for x in jax.device_get((nv_d, ntri_d)))
    D = len(_owned_tables()[0])
    if nv >= (1 << (31 - D)):
        # pass 2 packs vstart * 2^D into int32; beyond this the face
        # indices would silently wrap — refuse rather than corrupt
        # (derived D == 7 -> safe to 2^24 = 16.7M vertices)
        raise ValueError(f"mesh too large for the owned extractor: {nv} "
                         "vertices (int32 vstart packing)")
    vb = min(_qbucket(max(nv, 1)), verts_d.shape[0])
    tb = min(_qbucket(max(ntri, 1)), faces_d.shape[0])
    if packed and nv < (1 << _PACK_F0):
        sp = jnp.asarray(sdf_params, jnp.float32)
        buf = _fetch_parallel(_pack_mesh(verts_d, faces_d, sp, vb, tb))
        return _unpack_mesh(buf, sdf_params, vb, tb, nv, ntri)
    verts = _fetch_parallel(_slice_rows(verts_d, vb))[:nv]
    faces = _fetch_parallel(_slice_rows(faces_d, tb))[:ntri]
    return verts, faces


def records_n_iter(ids_len: int, n_cells: int, batch: int
                   ) -> tuple[int, int]:
    """(n_iter, fitted batch) for a record pass over the first n_cells of
    an ids buffer (qbucket-bucketed so repeated sizes reuse compiles)."""
    batch = _fit_batch(ids_len, batch)
    n_iter = min(_qbucket(max(1, -(-n_cells // batch))), ids_len // batch)
    return n_iter, batch


def records_dispatch(vol, ids, n_cells_d, *, iso: float, n_iter: int,
                     batch: int):
    """Dispatch-only record pass: n_cells may be a DEVICE scalar (slots
    past it mask out in-kernel), so this can launch speculatively at a
    predicted n_iter before any host sync — over-sized n_iter is always
    sound, under-sized only loses coverage of slots >= n_iter*batch (the
    caller re-dispatches at the exact bucket on that rare miss)."""
    rec_d, tq_d = _extract_records(vol, ids, n_cells_d, iso=float(iso),
                                   n_iter=n_iter, batch=batch)
    ids_s = _slice_rows(ids, n_iter * batch)
    return rec_d, tq_d, ids_s


def records_start_fetch(rec_d, tq_d, ids_s):
    """Start the device->host record transfer on the shared fetch pool: 4
    concurrent streams (tq split + ids + recs — the tunnel sustains
    ~52 MB/s across >=4 streams vs ~22 on one). Returns futures; the
    caller's thread is free to ride its own round trip (scalar sync)
    concurrently."""
    S = int(ids_s.shape[0])
    pool = _get_fetch_pool()
    tq_a = _slice_span(tq_d, 0, S // 2)
    tq_b = _slice_span(tq_d, S // 2, S)
    return [pool.submit(np.asarray, x)
            for x in (tq_a, tq_b, ids_s, rec_d)]


def expand_block_ids_np(blk: np.ndarray, R: int, S: int = 4
                        ) -> tuple[np.ndarray, int]:
    """Numpy oracle for native.mesh_expand_ids: (block id, 64-bit mask)
    rows -> the flat cell-id list of the device compaction (block-
    ascending, local-bit ascending)."""
    E = R
    B3 = (E + S - 1) // S
    m = (blk[:, 1].view(np.uint32).astype(np.uint64)
         | (blk[:, 2].view(np.uint32).astype(np.uint64) << np.uint64(32)))
    rows = ((m[:, None] >> np.arange(S ** 3, dtype=np.uint64)[None, :])
            & 1).astype(bool)
    bi, li = np.nonzero(rows)  # row-major == (block asc, bit asc)
    bids = blk[:, 0].astype(np.int64)
    bz = bids // (B3 * B3)
    by = (bids // B3) % B3
    bx = bids % B3
    base = ((bz * S) * E + by * S) * E + bx * S
    lz, ly, lx = li // (S * S), (li // S) % S, li % S
    ids = (base[bi] + (lz * E + ly) * E + lx).astype(np.int32)
    return ids, len(ids)


def _mask_cell_count(blk: np.ndarray) -> int:
    """Total cells encoded by the scan's (block id, 64-bit mask) rows."""
    return int(np.bitwise_count(blk[:, 1].view(np.uint32)).sum()
               + np.bitwise_count(blk[:, 2].view(np.uint32)).sum())


def records_start_fetch_masked(rec_d, tq_d, blk_d):
    """Fetch plan for the masked record path: the per-cell id stream is
    replaced by the scan's compacted block rows (blk [b2cap,3] i32 — 12
    bytes per CHANGE BLOCK vs 4 per cell, ~2.5x fewer bytes at typical
    ~6 cells/block), and tq — the biggest stream — splits three ways so
    the five concurrent streams land near-together on the ~52 MB/s
    aggregate tunnel. Returns futures [tq0, tq1, tq2, blk, rec]."""
    S = int(rec_d.shape[0])
    pool = _get_fetch_pool()
    t0, t1 = S // 3, 2 * S // 3
    parts = (_slice_span(tq_d, 0, t0), _slice_span(tq_d, t0, t1),
             _slice_span(tq_d, t1, S), blk_d, rec_d)
    return [pool.submit(np.asarray, x) for x in parts]


def records_start_fetch_compact(rec_d, tqc_d, blk_d):
    """Fetch plan for the compact record path: tq carries only CROSSING
    edges (vertex order, ~nv bytes instead of S*D — see _compact_tq), so
    the per-image transfer is ~470 KB instead of ~870. Five streams (tqc
    x2 + rec x2 + blk) keep the tunnel at its >=4-stream aggregate.
    Returns futures [tqc0, tqc1, rec0, rec1, blk]."""
    S = int(rec_d.shape[0])
    V = int(tqc_d.shape[0])
    pool = _get_fetch_pool()
    parts = (_slice_span(tqc_d, 0, V // 2), _slice_span(tqc_d, V // 2, V),
             _slice_span(rec_d, 0, S // 2), _slice_span(rec_d, S // 2, S),
             blk_d)
    return [pool.submit(np.asarray, x) for x in parts]


def _chunk_nv_np(rec_np: np.ndarray) -> int:
    """Crossing count of one fetched/derived rec chunk (the tqc_k[:nv_k]
    slice length — self-derived, so assembly never waits on flags)."""
    return int(np.bitwise_count(rec_np >> np.uint32(8)).sum())


def _derive_recs(blk_np: np.ndarray, imask_np: np.ndarray, R: int
                 ) -> np.ndarray:
    """Fetched u8 inside-mask stream -> the u32 (cross<<8 | inside)
    records the assemblers consume. The cross bits never cross the tunnel:
    every owned edge starts at corner 0, so cross_d = (inside bit 0 !=
    inside bit pair_j[d]), suppressed where the clamped edge aliases out
    of the grid at the R-1 boundary — exactly _records_from_words'
    device-side computation (pinned by test). Native C (~0.2 ms at 165k
    slots) with a vectorized-numpy fallback."""
    pair_i, pair_j, _, _ = _owned_tables()
    bad = ((CORNERS[pair_i] | CORNERS[pair_j]) > 0)        # [D, 3]
    badm = (bad << np.arange(3, dtype=np.int32)[None, :]).sum(1) \
        .astype(np.int32)                                  # axis bitmask
    try:
        from disn_tpu import native
        return native.derive_recs(blk_np, imask_np, R,
                                  np.asarray(pair_j, np.int32), badm)
    except (OSError, CalledProcessError):
        out = imask_np.astype(np.uint32)
        ids, n = expand_block_ids_np(blk_np, R)
        n = min(n, len(out))
        ids = ids[:n].astype(np.int64)
        E = R
        ghost = ((ids % E == E - 1).astype(np.int32)
                 | (((ids // E) % E == E - 1) << 1)
                 | ((ids // (E * E) == E - 1) << 2))
        im = out[:n]
        pj = np.asarray(pair_j, np.uint32)
        bitj = (im[:, None] >> pj[None, :]) & 1
        cross = (((im[:, None] & 1) != bitj)
                 & ((ghost[:, None] & badm[None, :]) == 0))
        cmask = (cross << np.arange(len(pj), dtype=np.uint32)[None, :]) \
            .sum(1).astype(np.uint32)
        out[:n] = im | (cmask << np.uint32(8))
        return out


def _records_parts(futs, mode: str, R: int):
    """(blk future, recs join, tq join) for a fetch-future list in the
    masked ([tq0,tq1,tq2,blk,rec]), compact ([tqc0,tqc1,rec0,rec1,blk]),
    or cchunk ([blk, rec_0..C-1, tqc_0..C-1, flags]) stream layout. The
    joins are lazy closures so the faces pass (which needs only blk+recs,
    the smallest streams) can overlap the in-flight tq tail on multi-core
    hosts. u8 rec streams (inside mask only) are derived to the full
    cross<<8|inside form ONCE on first join (_derive_recs) — the result
    is cached so tq_join / nv popcounts reuse it. For cchunk the tq join
    concatenates each chunk's tqc sliced to ITS crossing count (popcount
    of the chunk's derived recs) — vertex order is slot-major, so the
    result is byte-identical to the global compact stream."""
    if mode == "cchunk":
        c = (len(futs) - 2) // 2
        rec_fs = futs[1:1 + c]
        tq_fs = futs[1 + c:1 + 2 * c]
        blk_f = futs[0]
        state: dict = {}

        def recs_join():
            if "recs" not in state:
                parts = [f.result() for f in rec_fs]
                raw = parts[0] if c == 1 else np.concatenate(parts)
                state["bounds"] = np.cumsum([0] + [len(p) for p in parts])
                state["recs"] = (_derive_recs(blk_f.result(), raw, R)
                                 if raw.dtype == np.uint8 else raw)
            return state["recs"]

        def chunk_nvs():
            recs = recs_join()
            b = state["bounds"]
            return [_chunk_nv_np(recs[b[k]:b[k + 1]]) for k in range(c)]

        def tq_join():
            return np.concatenate(
                [tf.result()[:nvk]
                 for nvk, tf in zip(chunk_nvs(), tq_fs)])

        return blk_f, recs_join, tq_join, chunk_nvs
    if mode == "compact":
        return (futs[4],
                lambda: np.concatenate([futs[2].result(), futs[3].result()]),
                lambda: np.concatenate([futs[0].result(), futs[1].result()]),
                None)
    blk_f = futs[3]

    def recs_join_masked():
        raw = futs[4].result()
        return (_derive_recs(blk_f.result(), raw, R)
                if raw.dtype == np.uint8 else raw)

    return (blk_f, recs_join_masked,
            lambda: np.concatenate([f.result() for f in futs[:3]]), None)


def _assemble_from_records(blk_np, recs, tq_join, n_cells: int,
                           nv: int | None, R: int, sdf_params, mode: str):
    """Shared host assembly: validate the cell count against the block
    masks, then the native blocks-driven faces+verts passes (numpy oracle
    when the native build is unavailable). tq_join defers the tq
    concatenation until after the faces pass."""
    n = _mask_cell_count(blk_np)
    if n != n_cells:
        raise RuntimeError(
            f"block masks encode {n} cells, scan counted "
            f"{n_cells} (corrupt record stream)")
    compact = mode in ("compact", "cchunk")
    sdf_f = np.asarray(sdf_params, np.float32)
    try:
        from disn_tpu import native
        faces = native.mesh_faces_blocks(blk_np, recs, n_cells, R)
        verts = native.mesh_verts_blocks(blk_np, recs, tq_join(), n_cells,
                                         R, sdf_f, compact=compact, nv=nv)
        return verts, faces
    except (OSError, CalledProcessError):
        ids_np, _ = expand_block_ids_np(blk_np, R)
        return assemble_mesh_np(ids_np, recs, tq_join(), n_cells, R,
                                sdf_f, tq_compact=compact)


def _records_finish(futs, sdf_params, n_cells: int, nv: int | None, R: int,
                    mode: str):
    """Join the fetch futures -> zero-argument assembly closure.

    The closure OVERLAPS assembly with the transfer tail when the host has
    a spare core: blk and rec are the smallest streams, so the whole faces
    pass (which never touches tq) runs while the tq streams — the bulk of
    the bytes — are still in flight; the verts pass joins them last. On a
    SINGLE-core host the C passes would only timeshare against the fetch
    threads' memcpy (probe measured the 11 ms faces pass ballooning to
    130-370 ms under that contention), so there every stream joins first
    and assembly runs serially — the block-mask byte savings still
    apply."""
    import os
    overlap = (os.cpu_count() or 1) > 1
    blk_f, recs_join, tq_join, _ = _records_parts(futs, mode, R)

    def assemble():
        if not overlap:
            for f in futs:
                f.result()
        return _assemble_from_records(blk_f.result(), recs_join(), tq_join,
                                      n_cells, nv, R, sdf_params, mode)

    return assemble


def records_finish_compact(futs, sdf_params, n_cells: int, nv: int, R: int):
    """Compact-stream finish (the caller must have validated nv <= nvcap)."""
    return _records_finish(futs, sdf_params, n_cells, nv, R, "compact")


def records_finish_cchunk(futs, sdf_params, n_cells: int, nv: int, R: int):
    """Chunked-compact finish (caller validated every chunk nv_k <= its
    nvcap_k; futs layout [blk, rec_0.., tqc_0.., flags])."""
    return _records_finish(futs, sdf_params, n_cells, nv, R, "cchunk")


def records_finish_masked(futs, sdf_params, n_cells: int, R: int):
    """Masked-stream finish (slot-dense [n_cells, D] tq)."""
    return _records_finish(futs, sdf_params, n_cells, None, R, "masked")


_ASM_POOL = None
_ASM_POOL_LOCK = threading.Lock()


def _get_asm_pool():
    """One background thread for SPECULATIVE host assembly: it sleeps on
    the fetch futures (socket I/O, GIL released) while the main thread
    rides the validation-scalar round trip, then runs the native C passes
    (also GIL-free) — so even the single-core eval host overlaps assembly
    with the ~25-40 ms sync instead of serializing behind it."""
    global _ASM_POOL
    with _ASM_POOL_LOCK:
        if _ASM_POOL is None:
            from concurrent.futures import ThreadPoolExecutor
            _ASM_POOL = ThreadPoolExecutor(1)
    return _ASM_POOL


_INCR_ASM = True  # lag-1 chunk-incremental speculative assembly (A/B knob)


def records_assemble_speculative(futs, sdf_params, R: int, mode: str,
                                 nvcap: int | None = None,
                                 chunk_slots=None):
    """OPTIMISTIC assembly, submitted while the validation scalars are
    still crossing the tunnel: everything assembly needs is derivable from
    the fetched buffers themselves — the device zeroes record slots past
    the valid count, blk-mask expansion reproduces the scan's exact cell
    list (and count), and the crossing-bit popcount gives the vertex
    count — so the mesh is built CONCURRENTLY with the scalar sync, whose
    result afterwards only accepts or discards it.

    mode: 'masked' (futs from records_start_fetch_masked), 'compact'
    (records_start_fetch_compact), or 'cchunk' (chunked compact layout;
    nvcap is then the per-chunk cap TUPLE). Self-checks that would corrupt
    the mesh (record slots under-covering the scan, compact-tq vertex-cap
    overflow) return None — the caller then re-runs the exact path.

    Returns (future -> (verts, faces, n_cells, nv) | None, cancel_event);
    set the event on a validation discard so a speculation that hasn't
    reached the heavy C passes yet stops early."""
    cancel = threading.Event()
    sdf_f = np.asarray(sdf_params, np.float32)

    blk_f, recs_join, tq_join, chunk_nvs = _records_parts(futs, mode, R)

    def work_incr():
        """Chunk-incremental cchunk assembly (native.BlockAssembler): each
        landed chunk advances the faces pass over every row whose forward
        neighborhood is covered (lag-1) and emits its verts immediately, so
        after the LAST stream lands only that chunk's rows remain — the
        post-fetch tail drops from the whole faces+verts cost to its final
        share. Bit-identical output (same emission order)."""
        from disn_tpu import native
        c = (len(futs) - 2) // 2
        rec_fs = futs[1:1 + c]
        tq_fs = futs[1 + c:1 + 2 * c]
        blk_np = futs[0].result()
        if cancel.is_set():
            return None
        n = _mask_cell_count(blk_np)
        total = int(sum(chunk_slots))
        if n > total:  # slots under-covered the scan: bail to exact re-run
            return None
        asm = native.BlockAssembler(blk_np, n, total, R, sdf_f,
                                    int(sum(nvcap)))
        i0 = 0
        nv = 0
        for k in range(c):
            raw = rec_fs[k].result()
            if cancel.is_set():
                return None
            i1 = i0 + int(chunk_slots[k])
            if len(raw) != i1 - i0:  # dispatch-plan / stream mismatch
                return None
            if not asm.add_recs(raw, i0, i1):
                return None
            nv_k = asm.add_verts(tq_fs[k].result(), i0, nvcap[k])
            if nv_k is None:  # chunk tqc truncated (nv_k > its cap)
                return None
            nv += nv_k
            i0 = i1
        out = asm.finish()
        if out is None:
            return None
        verts, faces = out
        return verts, faces, n, nv

    def work():
        if mode == "cchunk" and chunk_slots is not None and _INCR_ASM:
            try:
                return work_incr()
            except (OSError, CalledProcessError):
                pass  # no native toolchain: the join-all path below
        # join-all-first for masked/compact, even with spare cores: the C
        # passes vs the in-flight fetch threads measured 11 -> 130-370 ms
        # under single-core contention (3 x ~200 KB tq streams in flight).
        # The CHUNKED layout's tqc chunks are ~40-60 KB each and land
        # within a few ms of blk+recs, so there the faces pass (which
        # never touches tq) overlaps the tiny tqc tail: _assemble_from_
        # records defers tq_join until after faces (probe_e2e_breakdown:
        # 'rest' 11.5 -> faces runs during the last chunks' flight)
        if mode == "cchunk":
            c = (len(futs) - 2) // 2
            for f in (futs[0], *futs[1:1 + c]):
                f.result()
        else:
            for f in futs:
                f.result()
        if cancel.is_set():
            return None
        blk_np = blk_f.result()
        recs = recs_join()
        n = _mask_cell_count(blk_np)
        if n > len(recs):  # slots under-covered the scan: nv/records
            return None    # truncated — exact re-run handles it
        nv = int(np.bitwise_count(recs[:n] >> np.uint32(8)).sum())
        if mode == "compact" and nvcap is not None and nv > nvcap:
            return None    # tq stream truncated (mode='drop' scatter)
        if mode == "cchunk":
            for k, nvk in enumerate(chunk_nvs()):
                if nvk > nvcap[k]:
                    return None  # that chunk's tqc stream is truncated
        if cancel.is_set():
            return None
        verts, faces = _assemble_from_records(
            blk_np, recs, tq_join, n,
            nv if mode in ("compact", "cchunk") else None,
            R, sdf_f, mode)
        return verts, faces, n, nv

    return _get_asm_pool().submit(work), cancel


def records_finish(futs, sdf_params, n_cells: int, R: int):
    """Join the fetch futures -> zero-argument host-assembly closure."""
    tq_np = np.concatenate([futs[0].result(), futs[1].result()])
    if tq_np.dtype == np.uint8:
        # exact u8->u16 range map (255 * 257 == 65535); the assemblers
        # consume u16 fixed point
        tq_np = tq_np.astype(np.uint16) * np.uint16(257)
    ids_np = futs[2].result()
    recs = futs[3].result()

    def assemble():
        try:
            from disn_tpu import native
            return native.mesh_assemble(ids_np, recs, tq_np, n_cells, R,
                                        np.asarray(sdf_params, np.float32))
        except (OSError, RuntimeError, CalledProcessError):
            return assemble_mesh_np(ids_np, recs, tq_np, n_cells, R,
                                    sdf_params)

    return assemble


def extract_mesh_records_deferred(vol, sdf_params, ids, n_cells: int,
                                  iso: float = 0.0, batch: int = 8192,
                                  join: bool = True, blk=None):
    """Record-mode extraction, split for the eval farm: this call does ALL
    device work (record pass dispatch + starting the parallel record fetch
    on the shared pool); the returned zero-argument closure runs host-side
    assembly, so a writer pool can overlap it (and the OBJ write) with the
    next image's device work.

    join=True (default) blocks here until the transfers land — the closure
    then holds plain numpy. join=False moves the future-join into the
    closure too: the caller's thread is free to dispatch the NEXT image's
    device chain while this image's records are still in flight on the
    fetch pool (no new device traffic originates off-thread — the safe
    kind of overlap; farm-measured win).

    blk: the candidate scan's (block id, 64-bit mask) rows when the caller
    has them (the fused pipeline's seed/re-run paths) — the id stream then
    never crosses the link (~2.5x fewer bytes) and assembly runs the
    blocks-driven C passes; None falls back to the 4-stream ids fetch
    (paths with no block rows, e.g. the sharded extractor)."""
    R = int(vol.shape[0])
    if n_cells == 0:
        return lambda: (np.zeros((0, 3), np.float32),
                        np.zeros((0, 3), np.int32))
    n_iter, batch = records_n_iter(int(ids.shape[0]), n_cells, batch)
    if blk is not None and n_iter * batch >= n_cells:
        rec_d, tq0, tq1, tq2, _ = _records_masked_split(
            vol, ids, jnp.int32(n_cells), iso=float(iso), n_iter=n_iter,
            batch=batch)
        futs = records_submit((tq0, tq1, tq2, blk, rec_d))
        fin = records_finish_masked(futs, sdf_params, n_cells, R)
        if join:
            for f in futs:
                f.result()
        return fin
    rec_d, tq_d, ids_s = records_dispatch(vol, ids, jnp.int32(n_cells),
                                          iso=iso, n_iter=n_iter,
                                          batch=batch)
    futs = records_start_fetch(rec_d, tq_d, ids_s)
    if join:
        return records_finish(futs, sdf_params, n_cells, R)
    return lambda: records_finish(futs, sdf_params, n_cells, R)()


def extract_mesh_records(vol, sdf_params, ids, n_cells: int,
                         iso: float = 0.0, batch: int = 8192
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Record-mode extraction: the device emits slot-dense per-cell records
    (static shapes — NO count sync), the host fetches three buffers in
    parallel and assembles the welded mesh natively."""
    return extract_mesh_records_deferred(vol, sdf_params, ids, n_cells,
                                         iso=iso, batch=batch)()


def extract_mesh_owned(volume, sdf_params, iso: float = 0.0,
                       gcap: int | None = None, batch: int = 8192,
                       packed: bool = False
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Owned-edge device extraction: volume -> welded (verts, faces) with
    no sort/weld pass and pow2-bucketed fetches (a fresh-shape device fetch
    costs ~550 ms in compiles on tunneled hosts). Raises ValueError when the
    group cap overflows (caller retries with a larger cap).

    packed=True transfers the mesh as one quantized u32 buffer (see
    _pack_mesh): ~40% of the bytes, vertex error <= 1.5e-5 of the bbox
    span. Falls back to exact f32 when nv exceeds the 21-bit field."""
    R = volume.shape[0]
    gcap = _norm_gcap(R, gcap)
    vol = jnp.asarray(volume, jnp.float32)
    ids, n_cells_d, g_over = _active_cells_ext(vol, float(iso), gcap)
    n_cells, gov = (int(x) for x in jax.device_get((n_cells_d, g_over)))
    if gov > 0:
        raise ValueError(f"active-cell group overflow: cap {gcap}")
    return extract_mesh_from_ids(vol, sdf_params, ids, n_cells_d, n_cells,
                                 iso=iso, gcap=gcap, batch=batch,
                                 packed=packed)


# --------------------------------------------------------------------------
# Pure-numpy oracle (slow; tests only) — same tables, per-cell loop.
# --------------------------------------------------------------------------

def marching_tets_np(volume: np.ndarray, sdf_params: np.ndarray,
                     iso: float = 0.0) -> np.ndarray:
    """[T,3,3] triangle soup; reference implementation for small grids."""
    edges_tbl, counts_tbl = _tables()
    R = volume.shape[0]
    lo, hi = np.asarray(sdf_params[:3]), np.asarray(sdf_params[3:6])

    def corner_pos(ix, iy, iz):
        f = np.array([ix, iy, iz], np.float64) / (R - 1)
        return lo + f * (hi - lo)

    tris = []
    for iz in range(R - 1):
        for iy in range(R - 1):
            for ix in range(R - 1):
                vals = np.array([volume[iz + o[2], iy + o[1], ix + o[0]]
                                 for o in CORNERS])
                pos = np.array([corner_pos(ix + o[0], iy + o[1], iz + o[2])
                                for o in CORNERS])
                inside = (vals < iso).astype(int)
                for t in range(6):
                    case = sum(inside[TETS[t, i]] << i for i in range(4))
                    for k in range(counts_tbl[t, case]):
                        tri = []
                        for v in range(3):
                            a, b = edges_tbl[t, case, k, v]
                            va, vb = vals[a], vals[b]
                            tt = 0.5 if abs(vb - va) < 1e-12 else \
                                (iso - va) / (vb - va)
                            tri.append(pos[a] + np.clip(tt, 0, 1)
                                       * (pos[b] - pos[a]))
                        tris.append(tri)
    return np.asarray(tris, np.float32).reshape(-1, 3, 3)
