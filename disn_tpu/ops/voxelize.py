"""Mesh voxelization for the IoU protocol (replaces pymesh.VoxelGrid,
test/test_iou.py:208-233).

The reference inserts the mesh into a VoxelGrid(2/dim) and marks the voxels
of the resulting voxel-mesh vertices with index (v + 1.1) / 2.4 * dim — i.e.
surface-voxel occupancy on a dim^3 grid covering [-1.1, 1.3). We reproduce
that protocol with area-adaptive triangle point sampling (enough samples per
triangle that no crossed cell is missed), plus an optional solid fill by
x-ray parity for watertight meshes.
"""
from __future__ import annotations

import numpy as np


def voxelize_surface(verts: np.ndarray, faces: np.ndarray, dim: int = 110,
                     offset: float = 1.1, span: float = 2.4,
                     samples_per_cell: float = 4.0) -> np.ndarray:
    """Boolean [dim,dim,dim] occupancy of cells crossed by the surface."""
    occ = np.zeros((dim, dim, dim), dtype=bool)
    if len(faces) == 0:
        return occ
    cell = span / dim
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]

    # always include the triangle corners
    def mark(pts):
        idx = np.floor((pts + offset) / span * dim).astype(np.int64)
        ok = ((idx >= 0) & (idx < dim)).all(axis=1)
        idx = idx[ok]
        occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True

    mark(verts)
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    n_samples = np.maximum(
        1, np.ceil(samples_per_cell * areas / (cell * cell)).astype(np.int64))
    # unlike core.meshes.sample_surface, the per-triangle sample COUNTS are
    # already area-proportional here, so barycentric coords are drawn on the
    # repeated triangle list directly (cell coverage, not uniform sampling)
    rng = np.random.RandomState(0)
    total = int(n_samples.sum())
    tri_idx = np.repeat(np.arange(len(faces)), n_samples)
    r1 = np.sqrt(rng.rand(total, 1)).astype(np.float32)
    r2 = rng.rand(total, 1).astype(np.float32)
    pts = ((1 - r1) * v0[tri_idx] + r1 * (1 - r2) * v1[tri_idx]
           + r1 * r2 * v2[tri_idx])
    mark(pts)
    return occ


def fill_solid(occ_surface: np.ndarray) -> np.ndarray:
    """Solid occupancy from a closed surface shell by exterior flood fill:
    cells not reachable from the boundary without crossing the shell are
    inside. Uses scipy's label (6-connectivity)."""
    from scipy import ndimage
    free = ~occ_surface
    labels, _ = ndimage.label(
        free, structure=ndimage.generate_binary_structure(3, 1))
    border_labels = np.unique(np.concatenate([
        labels[0].ravel(), labels[-1].ravel(),
        labels[:, 0].ravel(), labels[:, -1].ravel(),
        labels[:, :, 0].ravel(), labels[:, :, -1].ravel()]))
    outside = np.isin(labels, border_labels[border_labels > 0])
    return ~outside


def iou_meshes(mesh1: tuple[np.ndarray, np.ndarray],
               mesh2: tuple[np.ndarray, np.ndarray], dim: int = 110,
               solid: bool = False) -> float:
    """Reference IoU protocol between two meshes (test_iou.py:208-233)."""
    o1 = voxelize_surface(*mesh1, dim=dim)
    o2 = voxelize_surface(*mesh2, dim=dim)
    if solid:
        o1, o2 = fill_solid(o1), fill_solid(o2)
    union = np.logical_or(o1, o2).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(o1, o2).sum()) / float(union)
