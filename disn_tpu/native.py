"""ctypes bindings for the native C++ tools (native/).

Replaces the reference's shell-outs to prebuilt Vega binaries
(preprocessing/create_point_sdf_grid.py:200-210) with an in-process call. The
shared library is built on demand with make (g++ is in the image).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdistfield.so")
_lock = threading.Lock()
_lib = None
_FMT_TLS = threading.local()  # format_obj's reusable per-thread buffer


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        srcs = [os.path.join(_NATIVE_DIR, f)
                for f in ("distfield.cpp", "objwriter.cpp",
                          "objreader.cpp", "meshassemble.cpp",
                          "voxelsat.cpp")]
        if not os.path.exists(_LIB_PATH) or any(
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(s)
                for s in srcs):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libdistfield.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.compute_distance_field.restype = ctypes.c_int
        lib.compute_distance_field.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ]
        lib.format_obj.restype = ctypes.c_int64
        lib.format_obj.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char), ctypes.c_int64,
        ]
        lib.parse_obj.restype = ctypes.c_int64
        lib.parse_obj.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.mesh_assemble.restype = ctypes.c_int
        lib.mesh_assemble.argtypes = [
            i32p, u32p,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), i32p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mesh_expand_ids.restype = ctypes.c_int64
        lib.mesh_expand_ids.argtypes = [
            i32p, u32p, u32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p,
        ]
        lib.mesh_faces.restype = ctypes.c_int64
        lib.mesh_faces.argtypes = [
            i32p, u32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p,
        ]
        lib.mesh_verts.restype = ctypes.c_int64
        lib.mesh_verts.argtypes = [
            i32p, u32p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mesh_faces_blocks.restype = ctypes.c_int64
        lib.mesh_faces_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ] + [ctypes.POINTER(ctypes.c_int32)] * 6
        lib.mesh_verts_blocks.restype = ctypes.c_int64
        lib.mesh_verts_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.derive_recs.restype = ctypes.c_int
        lib.derive_recs.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.derive_recs_range.restype = ctypes.c_int
        lib.derive_recs_range.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.mesh_faces_blocks_incr.restype = ctypes.c_int64
        lib.mesh_faces_blocks_incr.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
        ] + [ctypes.POINTER(ctypes.c_int32)] * 5 + [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mesh_verts_blocks_range.restype = ctypes.c_int64
        lib.mesh_verts_blocks_range.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.voxelize_sat.restype = None
        lib.voxelize_sat.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            i32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def mesh_expand_ids(blk: np.ndarray, R: int, S: int = 4) -> tuple[np.ndarray,
                                                                  int]:
    """Expand the candidate scan's (block id, 64-bit change mask) rows
    (blk [n,3] i32: bid, mask_lo, mask_hi; masked-out rows are zero) into
    the flat cell-id list the device compaction emits. Returns (ids
    [n*S^3] i32 with the first n_cells valid, n_cells)."""
    lib = _load()
    blk = np.ascontiguousarray(blk, np.int32)
    n_blocks = len(blk)
    out = np.empty(n_blocks * S ** 3, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    bids = np.ascontiguousarray(blk[:, 0])
    mlo = np.ascontiguousarray(blk[:, 1]).view(np.uint32)
    mhi = np.ascontiguousarray(blk[:, 2]).view(np.uint32)
    n = lib.mesh_expand_ids(
        bids.ctypes.data_as(i32p), mlo.ctypes.data_as(u32p),
        mhi.ctypes.data_as(u32p), np.int32(n_blocks), np.int32(R),
        np.int32(S), out.ctypes.data_as(i32p))
    return out, int(n)


def mesh_faces(ids: np.ndarray, recs: np.ndarray, n_cells: int, R: int
               ) -> np.ndarray:
    """Faces-only pass of the record assembler (no tq needed): lets the
    caller overlap triangle emission with the still-in-flight edge-t
    stream. Vertex indices reference the slot-major/direction-minor order
    mesh_verts emits."""
    from disn_tpu.ops.marching import CORNERS, TETS, _owned_tables, _tables

    lib = _load()
    pair_i, pair_j, nb_tbl, dir_tbl = _owned_tables()
    D = len(pair_i)
    ids = np.ascontiguousarray(ids[:n_cells], np.int32)
    recs = np.ascontiguousarray(recs[:n_cells], np.uint32)
    i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    tables = [i32c(CORNERS), i32c(TETS), i32c(_tables()[1]), i32c(nb_tbl),
              i32c(dir_tbl)]
    faces = np.empty((n_cells * 12, 3), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ntri = lib.mesh_faces(
        ids.ctypes.data_as(i32p),
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        np.int32(n_cells), np.int32(R), np.int32(D),
        *[t.ctypes.data_as(i32p) for t in tables],
        faces.ctypes.data_as(i32p))
    if ntri < 0:
        raise RuntimeError(f"mesh_faces failed (rc={ntri})")
    return faces[:ntri].copy()


def derive_recs(blk: np.ndarray, imask: np.ndarray, R: int,
                pair_j: np.ndarray, bad: np.ndarray) -> np.ndarray:
    """Fetched u8 inside-mask stream -> u32 (cross<<8 | inside) records
    (host mirror of ops/marching._records_from_words — see derive_recs in
    meshassemble.cpp). blk: the scan's (block id, mask lo, mask hi) rows;
    pair_j [D]: corner index of each owned edge's far end; bad [D]:
    bitmask of axes on which the edge aliases at the grid boundary."""
    lib = _load()
    blk = np.ascontiguousarray(blk, np.int32)
    imask = np.ascontiguousarray(imask, np.uint8)
    out = np.empty(len(imask), np.uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    bids = np.ascontiguousarray(blk[:, 0])
    mlo = np.ascontiguousarray(blk[:, 1]).view(np.uint32)
    mhi = np.ascontiguousarray(blk[:, 2]).view(np.uint32)
    pair_j = np.ascontiguousarray(pair_j, np.int32)
    bad = np.ascontiguousarray(bad, np.int32)
    lib.derive_recs(
        bids.ctypes.data_as(i32p), mlo.ctypes.data_as(u32p),
        mhi.ctypes.data_as(u32p), np.int32(len(blk)),
        imask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(len(imask)), np.int32(R), np.int32(len(pair_j)),
        pair_j.ctypes.data_as(i32p), bad.ctypes.data_as(i32p),
        out.ctypes.data_as(u32p))
    # an under-covering stream (rows encode more cells than slots) is
    # detected by the callers' mask-count-vs-slots checks, not here
    return out


class BlockAssembler:
    """Incremental (lag-1) record assembler for the CHUNKED compact stream:
    feed each fetched rec/tqc chunk as it lands (in slot order) and the
    faces pass advances through every block row whose forward 2x2x2
    neighborhood is already covered, while verts for the chunk's slot range
    are emitted immediately (they are slot-local). After the LAST chunk only
    its own rows' faces + verts remain — the post-fetch assembly tail drops
    from the full ~8 ms (at 351k tris) to the final chunk's share. Output is
    bit-identical to mesh_faces_blocks + mesh_verts_blocks (same emission
    order; pinned by tests/test_marching.py). finish() returns VIEWS into
    the worst-case buffers (no tail memcpy); the buffers are per-image."""

    def __init__(self, blk: np.ndarray, n_cells: int, total_slots: int,
                 R: int, bbox: np.ndarray, nv_cap: int):
        from disn_tpu.ops.marching import CORNERS, TETS, _owned_tables, \
            _tables

        self._lib = _load()
        pair_i, pair_j, nb_tbl, dir_tbl = _owned_tables()
        self.D = len(pair_i)
        i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
        self._ftables = [i32c(CORNERS), i32c(TETS), i32c(_tables()[1]),
                         i32c(nb_tbl), i32c(dir_tbl)]
        self._vtables = [i32c(pair_i), i32c(pair_j), i32c(CORNERS)]
        self._pair_j = i32c(pair_j)
        bad = ((CORNERS[pair_i] | CORNERS[pair_j]) > 0)
        self._bad = i32c((bad << np.arange(3)[None, :]).sum(1))
        blk = np.ascontiguousarray(blk, np.int32)
        self._bids = np.ascontiguousarray(blk[:, 0])
        self._mlo = np.ascontiguousarray(blk[:, 1]).view(np.uint32)
        self._mhi = np.ascontiguousarray(blk[:, 2]).view(np.uint32)
        self._nrows = np.int32(len(blk))
        self.n_cells = int(n_cells)
        self.R = int(R)
        self._bbox = np.ascontiguousarray(bbox, np.float32)
        self.recs = np.empty(max(total_slots, 1), np.uint32)
        self._pv = np.empty(max(n_cells, 1), np.uint64)
        self._state = np.zeros(5, np.int64)
        self._faces = np.empty((max(n_cells, 1) * 12, 3), np.int32)
        self._verts = np.empty((max(nv_cap, 1), 3), np.float32)
        self.nv = 0
        self._avail = 0

    def add_recs(self, rec_raw: np.ndarray, i0: int, i1: int) -> bool:
        """Derive the chunk's records into the global array and advance the
        faces pass to every row covered by [0, min(i1, n_cells)). Chunks
        must arrive in slot order. False = corrupt input (caller bails to
        the exact path)."""
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        dst = self.recs[i0:i1]
        if rec_raw.dtype == np.uint8:
            raw = np.ascontiguousarray(rec_raw)
            self._lib.derive_recs_range(
                self._bids.ctypes.data_as(i32p),
                self._mlo.ctypes.data_as(u32p),
                self._mhi.ctypes.data_as(u32p), self._nrows,
                raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                np.int64(i0), np.int64(i1), np.int32(self.R),
                np.int32(self.D), self._pair_j.ctypes.data_as(i32p),
                self._bad.ctypes.data_as(i32p), dst.ctypes.data_as(u32p))
        else:
            dst[:] = rec_raw  # u16 (cross<<8|inside) ships whole (A/B arm)
        self._avail = min(i1, self.n_cells)
        ntri = self._lib.mesh_faces_blocks_incr(
            self._bids.ctypes.data_as(i32p),
            self._mlo.ctypes.data_as(u32p),
            self._mhi.ctypes.data_as(u32p), self._nrows,
            self.recs.ctypes.data_as(u32p), np.int32(self.n_cells),
            np.int64(self._avail), np.int32(self.R), np.int32(self.D),
            *[t.ctypes.data_as(i32p) for t in self._ftables],
            self._pv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self._state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._faces.ctypes.data_as(i32p))
        return ntri >= 0

    def add_verts(self, tq_raw: np.ndarray, i0: int, nvcap_k: int
                  ) -> int | None:
        """Emit the verts for slots [i0, avail) from the chunk's compact
        tqc stream (call after add_recs for the same chunk). Returns the
        chunk's vertex count, or None when it exceeds nvcap_k (truncated
        tqc — the device scatter dropped rows; caller bails)."""
        tq = np.asarray(tq_raw)
        if tq.dtype == np.uint8:  # exact u8 range map (marching._tq_bits)
            tq = tq.astype(np.uint16) * np.uint16(257)
        tq = np.ascontiguousarray(tq, np.uint16)
        cap = min(int(nvcap_k), len(self._verts) - self.nv)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        out = self._verts[self.nv:]
        got = self._lib.mesh_verts_blocks_range(
            self._bids.ctypes.data_as(i32p),
            self._mlo.ctypes.data_as(u32p),
            self._mhi.ctypes.data_as(u32p), self._nrows,
            self.recs[i0:].ctypes.data_as(u32p),
            tq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            np.int32(1), np.int64(i0), np.int64(self._avail),
            np.int32(self.R), np.int32(self.D), np.int64(max(cap, 0)),
            *[t.ctypes.data_as(i32p) for t in self._vtables],
            self._bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got < 0:
            return None
        self.nv += int(got)
        return int(got)

    def finish(self) -> tuple[np.ndarray, np.ndarray] | None:
        """(verts, faces) views once every chunk is in; None if the faces
        pass could not complete (records under-cover the scan)."""
        if self._avail < self.n_cells or self._state[1] < self.n_cells:
            return None
        return (self._verts[:self.nv],
                self._faces[:int(self._state[2])])


def mesh_faces_blocks(blk: np.ndarray, recs: np.ndarray, n_cells: int,
                      R: int, S: int = 4) -> np.ndarray:
    """Faces pass driven by the scan's (block id, 64-bit mask) rows —
    neighbor slots by mask-popcount arithmetic, no id list needed (see
    meshassemble.cpp). Drop-in faster replacement for mesh_expand_ids +
    mesh_faces on the assembly hot path."""
    from disn_tpu.ops.marching import CORNERS, TETS, _owned_tables, _tables

    lib = _load()
    pair_i, _, nb_tbl, dir_tbl = _owned_tables()
    D = len(pair_i)
    blk = np.ascontiguousarray(blk, np.int32)
    if len(recs) < n_cells:
        raise RuntimeError(f"{len(recs)} record slots < {n_cells} cells "
                           "(stream under-covers the scan)")
    recs = np.ascontiguousarray(recs[:n_cells], np.uint32)
    i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    tables = [i32c(CORNERS), i32c(TETS), i32c(_tables()[1]), i32c(nb_tbl),
              i32c(dir_tbl)]
    bids = np.ascontiguousarray(blk[:, 0])
    mlo = np.ascontiguousarray(blk[:, 1]).view(np.uint32)
    mhi = np.ascontiguousarray(blk[:, 2]).view(np.uint32)
    faces = np.empty((n_cells * 12, 3), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    ntri = lib.mesh_faces_blocks(
        bids.ctypes.data_as(i32p), mlo.ctypes.data_as(u32p),
        mhi.ctypes.data_as(u32p), np.int32(len(blk)),
        recs.ctypes.data_as(u32p), np.int32(n_cells), np.int32(R),
        np.int32(D), *[t.ctypes.data_as(i32p) for t in tables],
        faces.ctypes.data_as(i32p))
    if ntri < 0:
        raise RuntimeError(f"mesh_faces_blocks failed (rc={ntri})")
    return faces[:ntri].copy()


def mesh_verts_blocks(blk: np.ndarray, recs: np.ndarray, tq: np.ndarray,
                      n_cells: int, R: int, bbox: np.ndarray,
                      compact: bool = False, nv: int | None = None
                      ) -> np.ndarray:
    """Verts pass driven by the scan's block rows — cell coordinates come
    from the block walk, so no expanded id list is needed. compact=True
    reads tq as the crossing-only vertex-order stream (pass nv for output
    sizing and validation); otherwise tq is slot-dense [n_cells, D]."""
    from disn_tpu.ops.marching import CORNERS, _owned_tables

    lib = _load()
    pair_i, pair_j, _, _ = _owned_tables()
    D = len(pair_i)
    blk = np.ascontiguousarray(blk, np.int32)
    if len(recs) < n_cells or (not compact and len(tq) < n_cells):
        raise RuntimeError(f"{len(recs)} record slots < {n_cells} cells "
                           "(stream under-covers the scan)")
    recs = np.ascontiguousarray(recs[:n_cells], np.uint32)
    tq = np.asarray(tq if compact else tq[:n_cells])
    if tq.dtype == np.uint8:  # exact u8 range map (see marching._tq_bits)
        tq = tq.astype(np.uint16) * np.uint16(257)
    tq = np.ascontiguousarray(tq, np.uint16)
    i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    tables = [i32c(pair_i), i32c(pair_j), i32c(CORNERS)]
    bbox_f = np.ascontiguousarray(bbox, np.float32)
    cap = max(nv, 1) if compact and nv is not None else n_cells * D
    if compact and len(tq) < cap:
        raise RuntimeError(f"compact tq stream has {len(tq)} entries, "
                           f"caller claims {cap} vertices")
    verts = np.empty((max(cap, 1), 3), np.float32)
    bids = np.ascontiguousarray(blk[:, 0])
    mlo = np.ascontiguousarray(blk[:, 1]).view(np.uint32)
    mhi = np.ascontiguousarray(blk[:, 2]).view(np.uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    got = lib.mesh_verts_blocks(
        bids.ctypes.data_as(i32p), mlo.ctypes.data_as(u32p),
        mhi.ctypes.data_as(u32p), np.int32(len(blk)),
        recs.ctypes.data_as(u32p),
        tq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        np.int32(1 if compact else 0), np.int32(n_cells), np.int32(R),
        np.int32(D), np.int64(max(cap, 1)),
        *[t.ctypes.data_as(i32p) for t in tables],
        bbox_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0 or (compact and nv is not None and got != nv):
        raise RuntimeError(f"mesh_verts_blocks emitted {got} verts, "
                           f"records imply {nv} (corrupt record stream)")
    return verts[:got].copy()


def mesh_verts(ids: np.ndarray, recs: np.ndarray, tq: np.ndarray,
               n_cells: int, R: int, bbox: np.ndarray) -> np.ndarray:
    """Verts-only pass of the record assembler (the tq consumer)."""
    from disn_tpu.ops.marching import CORNERS, _owned_tables

    lib = _load()
    pair_i, pair_j, _, _ = _owned_tables()
    D = len(pair_i)
    ids = np.ascontiguousarray(ids[:n_cells], np.int32)
    recs = np.ascontiguousarray(recs[:n_cells], np.uint32)
    tq = np.asarray(tq[:n_cells])
    if tq.dtype == np.uint8:  # exact u8 range map (see marching._tq_bits)
        tq = tq.astype(np.uint16) * np.uint16(257)
    tq = np.ascontiguousarray(tq, np.uint16)
    i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    tables = [i32c(pair_i), i32c(pair_j), i32c(CORNERS)]
    bbox_f = np.ascontiguousarray(bbox, np.float32)
    verts = np.empty((n_cells * D, 3), np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    nv = lib.mesh_verts(
        ids.ctypes.data_as(i32p),
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        tq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        np.int32(n_cells), np.int32(R), np.int32(D),
        *[t.ctypes.data_as(i32p) for t in tables],
        bbox_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return verts[:nv].copy()


def mesh_assemble(ids: np.ndarray, recs: np.ndarray, tq: np.ndarray,
                  n_cells: int, R: int, bbox: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Welded (verts, faces) from the device's owned-edge slot records (see
    ops/marching.py::_extract_records / assemble_mesh_np — this is the
    numpy oracle's C twin; releases the GIL)."""
    from disn_tpu.ops.marching import CORNERS, TETS, _owned_tables, _tables

    lib = _load()
    pair_i, pair_j, nb_tbl, dir_tbl = _owned_tables()
    D = len(pair_i)
    ids = np.ascontiguousarray(ids[:n_cells], np.int32)
    recs = np.ascontiguousarray(recs[:n_cells], np.uint32)
    tq = np.asarray(tq[:n_cells])
    if tq.dtype == np.uint8:  # exact u8 range map (see marching._tq_bits)
        tq = tq.astype(np.uint16) * np.uint16(257)
    tq = np.ascontiguousarray(tq, np.uint16)
    i32c = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    # named so the arrays outlive the raw pointers passed to C
    tables = [i32c(pair_i), i32c(pair_j), i32c(CORNERS), i32c(TETS),
              i32c(_tables()[1]), i32c(nb_tbl), i32c(dir_tbl)]
    bbox_f = np.ascontiguousarray(bbox, np.float32)
    verts = np.empty((n_cells * D, 3), np.float32)
    faces = np.empty((n_cells * 12, 3), np.int32)
    out_counts = np.zeros(2, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.mesh_assemble(
        ids.ctypes.data_as(i32p),
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        tq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        np.int32(n_cells), np.int32(R), np.int32(D),
        *[t.ctypes.data_as(i32p) for t in tables],
        bbox_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(i32p),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc:
        raise RuntimeError(f"mesh_assemble failed (rc={rc})")
    return verts[:out_counts[0]].copy(), faces[:out_counts[1]].copy()


def format_obj(verts: np.ndarray, faces: np.ndarray | None) -> memoryview:
    """ASCII OBJ text for (verts [V,3] f32, faces [F,3] i32 0-based) via the
    C formatter (~50x the Python loop on single-core hosts; releases the
    GIL so eval-farm writer threads overlap device work). Returns a
    zero-copy memoryview into the formatting buffer (a 350k-tri mesh is
    ~12.5 MB — the old bytes copy held the GIL for tens of ms on the
    single-core eval host); call bytes() on it if you need to outlive the
    next format_obj call."""
    lib = _load()
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    nv = len(verts)
    if faces is None:
        faces = np.zeros((0, 3), np.int32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    nf = len(faces)
    cap = nv * (3 * 27 + 4) + nf * (3 * 12 + 4) + 64
    # thread-local grow-only buffer, NOT ctypes.create_string_buffer: the
    # latter zero-fills (a memset of the 66 MB worst case) and a fresh
    # np.empty pays first-touch page faults inside the format loop —
    # interleaved A/B/C at 800k tris: fresh string_buffer 91.5 ms,
    # fresh np.empty 67.1, reused buffer 53.8. Thread-local because farm
    # writer threads format concurrently on multicore hosts; the returned
    # view aliases the buffer (see docstring) so callers must consume it
    # before this thread's next format_obj call — write_obj does.
    buf = getattr(_FMT_TLS, "buf", None)
    if buf is None or buf.nbytes < cap:
        buf = np.empty(cap, np.uint8)
        _FMT_TLS.buf = buf
    n = lib.format_obj(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nf,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_char)), int(buf.nbytes))
    if n < 0:
        raise ValueError("format_obj buffer overflow")
    return memoryview(buf)[:n]


def parse_obj(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Parse ASCII OBJ bytes -> (verts [V,3] f32, faces [F,3] i32 0-based,
    polygons fan-triangulated) via the C parser — same semantics as the
    pure-Python codecs.read_obj loop, ~50x faster on the single-core eval
    hosts, and ctypes releases the GIL so evaluator worker threads overlap.
    Caps come from cheap byte counts ('\\nv ' / '\\nf ' occurrences); the
    rare polygon-heavy file that overflows the 2-triangles-per-face guess
    retries once at the parser-reported exact counts."""
    lib = _load()
    vcap = max(1, data.count(b"\nv ") + (1 if data.startswith(b"v ") else 0))
    fcap = 2 * max(1, data.count(b"\nf ")
                   + (1 if data.startswith(b"f ") else 0))
    counts = np.zeros(2, np.int64)
    for _ in range(2):
        verts = np.empty((vcap, 3), np.float32)
        faces = np.empty((fcap, 3), np.int32)
        rc = lib.parse_obj(
            data, len(data),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vcap,
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), fcap,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return (verts[:counts[0]].copy(), faces[:counts[1]].copy())
        if rc != -1:
            raise ValueError(f"parse_obj: malformed OBJ (rc={rc})")
        vcap, fcap = int(counts[0]), int(counts[1])
    raise ValueError("parse_obj: capacity retry failed")


def voxelize_sat(verts: np.ndarray, faces: np.ndarray, dim: int = 110,
                 offset: float = 1.1, span: float = 2.4) -> np.ndarray:
    """EXACT surface-voxel occupancy [dim]^3: a cell is marked iff some
    triangle geometrically intersects it (13-axis SAT in native/voxelsat.cpp)
    — the pymesh.VoxelGrid semantics of the reference IoU protocol
    (test/test_iou.py:208-233), with no sampling approximation. ctypes
    releases the GIL, so evaluator pool workers overlap."""
    lib = _load()
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    occ = np.zeros((dim * dim * dim,), dtype=np.uint8)
    lib.voxelize_sat(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int64(len(verts)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int64(len(faces)), np.int32(dim),
        np.float32(offset), np.float32(span),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return occ.reshape(dim, dim, dim).astype(bool)


def compute_distance_field(verts: np.ndarray, faces: np.ndarray, res: int,
                           bbox: np.ndarray, sign_votes: int = 3,
                           threads: int = 0, band: float = 0.0) -> np.ndarray:
    """Signed distance field on a (res+1)^3 grid (z,y,x indexed, x fastest).

    verts [V,3] float32, faces [F,3] int32, bbox [6] (x0 y0 z0 x1 y1 z1).
    band > 0 = narrow-band mode (exact within `band` of the surface, coarse
    interpolation beyond — the Vega -g semantics; ~10-20x faster at 256^3).
    Banding requires res % 4 == 0; otherwise the tool silently computes the
    exact field everywhere (correct but slow).
    """
    lib = _load()
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    bbox = np.ascontiguousarray(bbox, dtype=np.float64)
    out = np.empty(((res + 1) ** 3,), dtype=np.float32)
    rc = lib.compute_distance_field(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(len(verts)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(len(faces)), np.int32(res),
        bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(sign_votes), np.int32(threads), ctypes.c_double(band))
    if rc:
        raise RuntimeError(f"compute_distance_field failed (rc={rc})")
    return out.reshape(res + 1, res + 1, res + 1)
