"""Evaluation harness: walk a prediction tree against ground-truth meshes and
aggregate per-category metrics.

Mirrors the reference protocol (test/test_cd_emd.py:220-347,
test_f_score.py:159-243, test_iou.py:165-233): per object, sample `n` points
from the GT `isosurf.obj` and from each of `view_num` predicted view meshes,
compute CD / EMD (average and best-view per object), F-score at
{0.5,1,2,5,10,20}% x side_len thresholds, and voxel IoU at dim=110; report
per-category means plus the category-weighted overall mean. All point-cloud
metrics run batched on device (eval/metrics.py); IoU voxelization runs on
host workers like the reference's joblib pool.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from disn_tpu.core import codecs
from disn_tpu.data import listing
from disn_tpu.eval import metrics
from disn_tpu.ops import voxelize

F_THRESHOLDS = (0.5, 1.0, 2.0, 5.0, 10.0, 20.0)  # percent (test_f_score:291)
SIDE_LEN = 2.5                                    # truethreshold (:41)


def _mesh_points(path: str, n: int, rng: np.random.RandomState,
                 protocol: str = "vertices") -> np.ndarray | None:
    if not os.path.exists(path):
        return None
    verts, faces = codecs.read_obj(path)
    if len(verts) == 0:
        return None
    if protocol == "surface" and len(faces):
        return metrics.sample_mesh_surface(verts, faces, n, rng)
    return metrics.sample_mesh_vertices(verts, n, rng)


def evaluate_object(gt_mesh: str, pred_meshes: list[str], num_points: int,
                    which: set[str], dim: int, seed: int = 0,
                    protocol: str = "vertices",
                    device_iou: bool = False) -> dict | None:
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    gt_pts = _mesh_points(gt_mesh, num_points, rng, protocol)
    if gt_pts is None:
        return None
    preds = []
    pred_paths = []
    for p in pred_meshes:
        pts = _mesh_points(p, num_points, rng, protocol)
        if pts is not None:
            preds.append(pts)
            pred_paths.append(p)
    if not preds:
        return None
    pred_arr = jnp.asarray(np.stack(preds))
    gt_arr = jnp.asarray(np.broadcast_to(gt_pts, pred_arr.shape))

    out: dict = {"views": len(preds)}
    if "cd" in which or "emd" in which:
        ce = metrics.chamfer_emd(pred_arr, gt_arr)
        cd = np.asarray(ce["cd"])
        emd = np.asarray(ce["emd"])
        out.update(cd_avg=float(cd.mean()), cd_min=float(cd.min()),
                   cd_best_view=pred_paths[int(cd.argmin())],
                   emd_avg=float(emd.mean()), emd_min=float(emd.min()))
    if "fscore" in which:
        th = np.asarray(F_THRESHOLDS, np.float32) * 0.01 * SIDE_LEN
        fs = metrics.f_score(pred_arr, gt_arr, th)
        out["f1"] = np.asarray(fs["f1"]).mean(axis=1).tolist()  # per thresh
    if "iou" in which:
        gt = codecs.read_obj(gt_mesh)
        iou_fn = voxelize.iou_meshes_device if device_iou \
            else voxelize.iou_meshes
        ious = []
        for p in pred_paths:
            ious.append(iou_fn(gt, codecs.read_obj(p), dim=dim))
        out["iou_avg"] = float(np.mean(ious))
        out["iou_best"] = float(np.max(ious))
    return out


def evaluate_tree(pred_dir: str, gt_dir: str, lst_dir: str,
                  split: str = "test", metrics_list: list[str] | None = None,
                  metrics: list[str] | None = None, num_points: int = 2048,
                  view_num: int = 24, dim: int = 110, workers: int = 8,
                  protocol: str = "vertices",
                  device_iou: bool = False) -> dict:
    """pred tree: {pred_dir}/{cat}/{cat}_{obj}_{view}.obj
    gt tree:   {gt_dir}/{cat}/{obj}/isosurf.obj"""
    which = set(metrics or metrics_list or ["cd", "emd", "fscore", "iou"])
    cats = {}
    import glob as _glob
    for f in _glob.glob(os.path.join(lst_dir, f"*_{split}.lst")):
        cat = os.path.basename(f).rsplit("_", 1)[0]
        cats[cat] = listing.read_lst(f)

    results: dict = {"categories": {}, "num_points": num_points}
    weighted: dict[str, float] = {}
    total_objs = 0
    for cat, objs in sorted(cats.items()):
        per_obj = []
        jobs = []
        for obj in objs:
            gt_mesh = os.path.join(gt_dir, cat, obj, "isosurf.obj")
            preds = [os.path.join(pred_dir, cat, f"{cat}_{obj}_{v:02d}.obj")
                     for v in range(view_num)]
            jobs.append((gt_mesh, preds))
        with ThreadPoolExecutor(workers) as pool:
            for r in pool.map(lambda j: evaluate_object(
                    j[0], j[1], num_points, which, dim, protocol=protocol,
                    device_iou=device_iou), jobs):
                if r is not None:
                    per_obj.append(r)
        if not per_obj:
            continue
        summary = {"objects": len(per_obj)}
        for key in ("cd_avg", "cd_min", "emd_avg", "emd_min", "iou_avg",
                    "iou_best"):
            vals = [o[key] for o in per_obj if key in o]
            if vals:
                summary[key] = float(np.mean(vals))
        f1s = [o["f1"] for o in per_obj if "f1" in o]
        if f1s:
            summary["f1"] = np.mean(np.asarray(f1s), axis=0).tolist()
            summary["f1_thresholds_pct"] = list(F_THRESHOLDS)
        results["categories"][cat] = summary
        total_objs += len(per_obj)
        for k, v in summary.items():
            if isinstance(v, float):
                weighted[k] = weighted.get(k, 0.0) + v * len(per_obj)
    results["overall"] = {k: v / max(total_objs, 1)
                          for k, v in weighted.items() if k != "objects"}
    results["total_objects"] = total_objs
    return results
