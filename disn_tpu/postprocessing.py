"""Mesh post-processing (re-imagining postprocessing/clean_smallparts.py).

Splits a mesh into connected components (union-find over shared vertices —
replaces pymesh.separate_mesh), keeps components with at least `vert_ratio` x
the largest component's vertex count AND centroid within `center_dist` of
the origin, and re-merges (clean_smallparts.py:38-54)."""
from __future__ import annotations

import numpy as np


def connected_components(n_verts: int, faces: np.ndarray) -> np.ndarray:
    """[n_verts] component label per vertex (union-find)."""
    parent = np.arange(n_verts)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for f in faces:
        a = find(f[0])
        for v in f[1:]:
            b = find(v)
            if a != b:
                parent[b] = a
    return np.asarray([find(i) for i in range(n_verts)])


def clean_small_parts(verts: np.ndarray, faces: np.ndarray,
                      vert_ratio: float = 0.3, center_dist: float = 0.5
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Drop small / far-from-center components; reindex the kept mesh."""
    if len(faces) == 0:
        return verts, faces
    labels = connected_components(len(verts), faces)
    uniq, counts = np.unique(labels, return_counts=True)
    max_count = counts.max()
    keep_labels = set()
    for lab, cnt in zip(uniq, counts):
        comp_verts = verts[labels == lab]
        centroid = comp_verts.mean(axis=0)
        if cnt >= vert_ratio * max_count and \
                np.linalg.norm(centroid) <= center_dist:
            keep_labels.add(int(lab))
    keep_mask = np.isin(labels, list(keep_labels))
    remap = -np.ones(len(verts), np.int64)
    remap[keep_mask] = np.arange(keep_mask.sum())
    face_keep = keep_mask[faces].all(axis=1)
    new_faces = remap[faces[face_keep]].astype(np.int32)
    return verts[keep_mask], new_faces


def clean_mesh_file(src: str, dst: str, vert_ratio: float = 0.3,
                    center_dist: float = 0.5) -> None:
    from disn_tpu.core import codecs
    verts, faces = codecs.read_obj(src)
    v, f = clean_small_parts(verts, faces, vert_ratio, center_dist)
    codecs.write_obj(dst, v, f)
