"""On-disk format codecs: the `.dist` distance-field binary, SDF-sample h5,
image+camera h5, and OBJ meshes.

`.dist` layout (reference: test/create_sdf.py:292-303 writer,
preprocessing/create_point_sdf_grid.py:29-51 reader):
    int32  -res, res, res
    float64 x0 y0 z0 x1 y1 z1        (bbox: bottom-left, top-right corners)
    float32 values[(res+1)^3]        (x fastest, then y, then z)
"""
from __future__ import annotations

import os
import struct
import sys
from dataclasses import dataclass
from subprocess import CalledProcessError

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is expected in the image
    h5py = None


# --------------------------------------------------------------------------
# .dist distance-field volumes
# --------------------------------------------------------------------------

@dataclass
class DistField:
    params: np.ndarray  # [6] float32 bbox (x0 y0 z0 x1 y1 z1)
    values: np.ndarray  # [(res+1), (res+1), (res+1)] float32, indexed [z,y,x]

    @property
    def res(self) -> int:
        return self.values.shape[0] - 1


def read_dist(path: str, expect_res: int | None = None) -> DistField:
    with open(path, "rb") as f:
        raw = f.read()
    ress = np.frombuffer(raw[:12], dtype=np.int32)
    res = int(ress[1])
    if -ress[0] != res or ress[2] != res:
        raise ValueError(f"{path}: inconsistent header {ress}")
    if expect_res is not None and res != expect_res:
        raise ValueError(f"{path}: res {res} != expected {expect_res}")
    params = np.frombuffer(raw[12:12 + 48], dtype=np.float64).astype(np.float32)
    values = np.frombuffer(raw[60:], dtype=np.float32)
    n = res + 1
    if values.size != n ** 3:
        raise ValueError(f"{path}: {values.size} values, expected {n ** 3}")
    return DistField(params=params, values=values.reshape(n, n, n).copy())


def write_dist(path: str, res: int, params: np.ndarray, values: np.ndarray) -> None:
    """values may be flat [(res+1)^3] (x fastest) or [z,y,x] shaped."""
    values = np.ascontiguousarray(np.asarray(values, dtype=np.float32)).reshape(-1)
    if values.size != (res + 1) ** 3:
        raise ValueError(f"{values.size} values for res {res}")
    with open(path, "wb") as f:
        f.write(struct.pack("iii", -res, res, res))
        f.write(struct.pack("d" * 6, *[float(p) for p in params]))
        f.write(values.tobytes())


# --------------------------------------------------------------------------
# SDF sample h5 (per object): keys pc_sdf_original, pc_sdf_sample [N,4],
# norm_params [4] (centroid, m), sdf_params [6]
# (reference: preprocessing/create_point_sdf_grid.py:139-166).
# --------------------------------------------------------------------------

@dataclass
class SdfSamples:
    ori_pt: np.ndarray        # [M,3] surface/original points
    sample_pt: np.ndarray     # [N,3]
    sample_sdf: np.ndarray    # [N]
    norm_params: np.ndarray   # [4]
    sdf_params: np.ndarray    # [6]


def write_sdf_h5(path: str, samples: np.ndarray, norm_params: np.ndarray,
                 sdf_params: np.ndarray, ori_pt: np.ndarray | None = None) -> None:
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    if ori_pt is None:
        ori_pt = np.zeros((1, 3), dtype=np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("pc_sdf_original", data=ori_pt.astype(np.float32),
                         compression="gzip", compression_opts=4)
        f.create_dataset("pc_sdf_sample", data=samples.astype(np.float32),
                         compression="gzip", compression_opts=4)
        f.create_dataset("norm_params", data=np.asarray(norm_params, np.float32),
                         compression="gzip", compression_opts=4)
        f.create_dataset("sdf_params", data=np.asarray(sdf_params, np.float32),
                         compression="gzip", compression_opts=4)


def read_sdf_h5(path: str) -> SdfSamples:
    """Mirrors get_sdf_h5 (data/data_sdf_h5_queue.py:121-142)."""
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        if not ("pc_sdf_original" in f and "pc_sdf_sample" in f and "norm_params" in f):
            raise KeyError(f"{path}: missing sdf datasets")
        ori = f["pc_sdf_original"][:].astype(np.float32)
        sample = f["pc_sdf_sample"][:].astype(np.float32)
        if sample.shape[1] == 4:
            sample_pt, sample_sdf = sample[:, :3], sample[:, 3]
        else:
            sample_pt, sample_sdf = None, sample[:, 0]  # full-grid variant
        return SdfSamples(
            ori_pt=ori[:, :3],
            sample_pt=sample_pt,
            sample_sdf=sample_sdf,
            norm_params=f["norm_params"][:].astype(np.float32),
            sdf_params=f["sdf_params"][:].astype(np.float32),
        )


def read_sdf_params(path: str) -> np.ndarray:
    """Only the [6+] sdf_params dataset — the one field reconstruction
    needs. read_sdf_h5 gunzips the complete sample arrays for it (3.6 ms
    CPU/view even on the tiny fixture, more on real ShapeNet), and the
    1-core eval farm is host-CPU-bound, so its reader takes this plus a
    per-object cache instead."""
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        return f["sdf_params"][:].astype(np.float32)


# --------------------------------------------------------------------------
# Image+camera h5 (per view): img_arr [H,W,4] uint8, trans_mat [4,3], K, RT,
# obj_rot_mat [3,3], regress_mat [4,3]
# (reference: preprocessing/create_img_h5.py:188-201).
# --------------------------------------------------------------------------

@dataclass
class ViewRecord:
    img_arr: np.ndarray       # [H,W,4] uint8 RGBA
    trans_mat: np.ndarray     # [4,3] float32
    K: np.ndarray             # [3,3]
    RT: np.ndarray            # [3,4]
    obj_rot_mat: np.ndarray   # [3,3]
    regress_mat: np.ndarray   # [4,3]


def write_view_h5(path: str, rec: ViewRecord) -> None:
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("img_arr", data=rec.img_arr.astype(np.uint8),
                         compression="gzip", compression_opts=4)
        for k in ("trans_mat", "K", "RT", "obj_rot_mat", "regress_mat"):
            f.create_dataset(k, data=getattr(rec, k).astype(np.float32),
                             compression="gzip", compression_opts=4)


def read_view_h5(path: str) -> ViewRecord:
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        return ViewRecord(
            img_arr=f["img_arr"][:],
            trans_mat=f["trans_mat"][:].astype(np.float32),
            K=f["K"][:].astype(np.float32),
            RT=f["RT"][:].astype(np.float32),
            obj_rot_mat=f["obj_rot_mat"][:].astype(np.float32),
            regress_mat=f["regress_mat"][:].astype(np.float32),
        )


# --------------------------------------------------------------------------
# OBJ meshes
# --------------------------------------------------------------------------

_WARNED_NATIVE = False


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray | None = None) -> None:
    """Write a triangle mesh (or point cloud when faces is None). Faces are
    0-based in memory, 1-based on disk per the OBJ spec.

    Large meshes route through the native C formatter (native.format_obj):
    Python text formatting of a 350k-tri mesh costs ~2.5 s on the
    single-core eval hosts and holds the GIL, serializing the eval farm's
    writer pool against device work."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    vertices = np.asarray(vertices)
    if len(vertices) > 4096:
        data = None
        try:
            from disn_tpu import native
            data = native.format_obj(vertices, faces)
        except Exception as e:  # native build/ABI failure only: the
            # Python fallback formatter is ~50x slower — say so once
            global _WARNED_NATIVE
            if not _WARNED_NATIVE:
                _WARNED_NATIVE = True
                # stderr: callers (bench.py) have a machine-readable
                # stdout contract a stray warning would corrupt
                print(f"write_obj: native formatter unavailable ({e!r}); "
                      "falling back to the slow Python writer",
                      file=sys.stderr)
        if data is not None:
            # I/O errors must surface, not retry through the slow path
            with open(path, "wb") as f:
                f.write(data)
            return
    lines = [f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}" for v in vertices]
    if faces is not None:
        lines += [f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}" for f in np.asarray(faces)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: vertices + triangulated faces (fan-triangulates
    polygons; ignores normals/texcoords/materials).

    Large files route through the native C parser (native.parse_obj, same
    semantics, tested for parity): the Python line loop costs ~seconds on a
    350k-tri mesh on single-core eval hosts and holds the GIL — it would
    dominate a full-split evaluation (GT + 24 view meshes per object) the
    way Python OBJ formatting dominated the farm before objwriter.cpp."""
    if os.path.getsize(path) > 1 << 16:
        try:
            from disn_tpu import native
            with open(path, "rb") as f:
                return native.parse_obj(f.read())
        except (OSError, CalledProcessError, ValueError):
            pass  # native build unavailable/odd file: Python fallback
    verts: list[list[float]] = []
    faces: list[list[int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append([float(p[1]), float(p[2]), float(p[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return (np.asarray(verts, dtype=np.float32),
            np.asarray(faces, dtype=np.int32).reshape(-1, 3))
