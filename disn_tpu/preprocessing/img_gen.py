"""Offline image+camera h5 generation (re-imagining
preprocessing/create_img_h5.py).

For each rendered view of an object, composes the Blender intrinsics K and
extrinsics RT from the render metadata (azimuth, elevation, distance ratio —
getBlenderProj, create_img_h5.py:14-63), the fixed model-frame rotation and
unit-sphere de-normalization (rot_mat/norm_mat :65-123), and stores the
137x137 RGBA image together with the transposed right-multiply matrices
trans_mat = (K RT rot norm)^T and regress_mat = (RT rot norm)^T (:184-186) in
one h5 per view (:188-201).
"""
from __future__ import annotations

import os

import numpy as np

from disn_tpu.core import camera, codecs


def view_record_from_meta(img_rgba: np.ndarray, az: float, el: float,
                          distance_ratio: float, centroid: np.ndarray,
                          m: float, inl: float = 0.0,
                          img_w: int = 137, img_h: int = 137
                          ) -> codecs.ViewRecord:
    trans, regress, K, RT = camera.view_params_to_trans_mat(
        az, el, distance_ratio, centroid, m, img_w=img_w, img_h=img_h)
    return codecs.ViewRecord(
        img_arr=np.asarray(img_rgba, np.uint8),
        trans_mat=trans, K=K, RT=RT,
        obj_rot_mat=camera.obj_rot_matrix(az, el, inl),
        regress_mat=regress)


def parse_render_metadata(path: str) -> list[tuple[float, float, float, float]]:
    """rendering_metadata.txt lines -> (az, el, inl, distance_ratio).

    The ShapeNet renderer writes 'az el inl distance fov ...' per view
    (consumed at create_img_h5.py:156-183)."""
    out = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 4:
                out.append((float(p[0]), float(p[1]), float(p[2]),
                            float(p[3])))
    return out


def generate_object_views(images: list[np.ndarray],
                          metas: list[tuple[float, float, float, float]],
                          norm_params: np.ndarray, out_dir: str,
                          skip_existing: bool = True) -> list[str]:
    """Write one h5 per view: {out_dir}/{view:02d}.h5. norm_params is the
    [4] (centroid, m) vector from the SDF h5 of the same object — the two
    pipelines must agree on normalization (create_img_h5.py:164-171)."""
    os.makedirs(out_dir, exist_ok=True)
    centroid = np.asarray(norm_params[:3], np.float64)
    m = float(norm_params[3])
    paths = []
    for i, (img, (az, el, inl, dist)) in enumerate(zip(images, metas)):
        path = os.path.join(out_dir, f"{i:02d}.h5")
        paths.append(path)
        if skip_existing and os.path.exists(path):
            continue
        rec = view_record_from_meta(img, az, el, dist, centroid, m, inl=inl)
        codecs.write_view_h5(path, rec)
    return paths
