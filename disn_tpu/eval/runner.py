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


def _load_mesh(path: str) -> tuple[np.ndarray, np.ndarray] | None:
    if not os.path.exists(path):
        return None
    verts, faces = codecs.read_obj(path)
    if len(verts) == 0:
        return None
    return verts, faces


def _mesh_points(mesh: tuple[np.ndarray, np.ndarray], n: int,
                 rng: np.random.RandomState,
                 protocol: str = "vertices") -> np.ndarray:
    verts, faces = mesh
    if protocol == "surface" and len(faces):
        return metrics.sample_mesh_surface(verts, faces, n, rng)
    return metrics.sample_mesh_vertices(verts, n, rng)


def _object_host(gt_mesh: str, pred_meshes: list[str], num_points: int,
                 which: set[str], dim: int, seed: int = 0,
                 protocol: str = "vertices",
                 device_iou: bool = False) -> tuple | None:
    """HOST half of one object's metrics (runs on evaluator pool workers):
    parse each mesh ONCE, sample the point clouds, and compute IoU with
    the GT occupancy grid voxelized ONCE per object (the old per-view loop
    re-read every mesh and re-voxelized the GT 24x — measured 9.5 s of the
    10.5 s full-protocol object cost at production mesh sizes,
    scripts/eval_rehearsal.py round 4). NO device work happens here: device
    traffic from pool worker threads contends on the (possibly tunneled)
    device link — device-voxel IoU from the 8-thread pool measured 10x
    SLOWER than host voxelization (784 vs 76 s / 8 objects), the round-2
    farm finding applied to eval. Returns (pred_pts [V,n,3], gt_pts [n,3],
    pred_paths, partial-out dict) or None."""
    rng = np.random.RandomState(seed)
    gt = _load_mesh(gt_mesh)
    if gt is None:
        return None
    gt_pts = _mesh_points(gt, num_points, rng, protocol)
    preds = []
    pred_paths = []
    pred_meshes_np = []
    for p in pred_meshes:
        mesh = _load_mesh(p)
        if mesh is not None:
            preds.append(_mesh_points(mesh, num_points, rng, protocol))
            pred_paths.append(p)
            pred_meshes_np.append(mesh if "iou" in which else None)
    if not preds:
        return None
    out: dict = {"views": len(preds)}
    if "iou" in which:
        if device_iou:
            # device voxelization must NOT run here: this function executes
            # on pool workers, and device traffic from worker threads is
            # the documented 10x tunnel-contention poison — defer the
            # meshes to _object_device (caller thread) instead
            out["_iou_meshes"] = (gt, pred_meshes_np)
        else:
            _host_iou(gt, pred_meshes_np, dim, voxelize.voxelize_surface,
                      out)
    return np.stack(preds), gt_pts, pred_paths, out


def _host_iou(gt, pred_meshes_np, dim: int, occ_fn, out: dict) -> None:
    o_gt = occ_fn(*gt, dim=dim)
    ious = []
    for mesh in pred_meshes_np:
        o_p = occ_fn(*mesh, dim=dim)
        union = np.logical_or(o_gt, o_p).sum()
        ious.append(0.0 if union == 0
                    else float(np.logical_and(o_gt, o_p).sum())
                    / float(union))
    out["iou_avg"] = float(np.mean(ious))
    out["iou_best"] = float(np.max(ious))


def _object_device(host: tuple, which: set[str], dim: int = 110) -> dict:
    """DEVICE half (chamfer/EMD/F-score on the stacked view batch, plus
    device-voxel IoU when device_iou deferred it here) — called from ONE
    thread only; see _object_host."""
    import jax.numpy as jnp
    preds_np, gt_pts, pred_paths, out = host
    iou_meshes = out.pop("_iou_meshes", None)
    if iou_meshes is not None:
        _host_iou(iou_meshes[0], iou_meshes[1], dim,
                  voxelize.occupancy_device, out)
    pred_arr = jnp.asarray(preds_np)
    gt_arr = jnp.asarray(np.broadcast_to(gt_pts, pred_arr.shape))
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
        # per-object mean precision/recall feed the reference's overall
        # aggregate: category-weighted P/R means, THEN the harmonic mean
        # (test_f_score.py:176-181) — not a mean of per-object F1s
        out["f_precision"] = np.asarray(fs["precision"]).mean(axis=1).tolist()
        out["f_recall"] = np.asarray(fs["recall"]).mean(axis=1).tolist()
    return out


def evaluate_object(gt_mesh: str, pred_meshes: list[str], num_points: int,
                    which: set[str], dim: int, seed: int = 0,
                    protocol: str = "vertices",
                    device_iou: bool = False) -> dict | None:
    """One object's full metric dict (host + device halves; see
    _object_host/_object_device for the split rationale)."""
    host = _object_host(gt_mesh, pred_meshes, num_points, which, dim,
                        seed=seed, protocol=protocol, device_iou=device_iou)
    if host is None:
        return None
    return _object_device(host, which, dim=dim)


def _cache_key(num_points: int, which: set[str], dim: int, protocol: str,
               n_preds: int) -> dict:
    return {"num_points": num_points, "which": sorted(which), "dim": dim,
            "protocol": protocol, "n_preds": n_preds}


def _cache_load(path: str, key: dict) -> dict | None:
    """Per-object distance/metric cache, the reference's resume mechanism
    (test_f_score.py:203-231 caches NN distances to txt so a killed
    full-split eval skips finished objects). We cache the final per-object
    metric dict keyed by the full protocol config."""
    import json
    try:
        with open(path) as f:
            blob = json.load(f)
    except (OSError, ValueError):
        return None
    return blob.get("result") if blob.get("key") == key else None


def _cache_store(path: str, key: dict, result: dict) -> None:
    import json
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "result": result}, f)
    os.replace(tmp, path)  # atomic: a killed eval never leaves torn JSON


def evaluate_tree(pred_dir: str, gt_dir: str, lst_dir: str,
                  split: str = "test", metrics_list: list[str] | None = None,
                  metrics: list[str] | None = None, num_points: int = 2048,
                  view_num: int = 24, dim: int = 110, workers: int = 8,
                  protocol: str = "vertices",
                  device_iou: bool = False,
                  cache_dir: str | None = None) -> dict:
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
            jobs.append((obj, gt_mesh, preds))

        def host_one(j: tuple):
            """Pool-worker half: cache lookup + all HOST work (parse,
            sample, voxelize). Device metrics run on the caller's thread
            only — device traffic from worker threads contends on the
            (possibly tunneled) link (see _object_host)."""
            obj, gt_mesh, preds = j
            key = _cache_key(num_points, which, dim, protocol, len(preds))
            cpath = (os.path.join(cache_dir, cat, obj + ".json")
                     if cache_dir else None)
            if cpath is not None:
                hit = _cache_load(cpath, key)
                if hit is not None:
                    return ("hit", hit, cpath, key)
            host = _object_host(gt_mesh, preds, num_points, which, dim,
                                protocol=protocol, device_iou=device_iou)
            return ("miss", host, cpath, key)

        from collections import deque
        with ThreadPoolExecutor(workers) as pool:
            # bounded submit window (2x workers ahead): host halves
            # prefetch while the main thread owns the strictly-sequential
            # device metric calls, but completed payloads — stacked
            # [views,n,3] point clouds — never accumulate unboundedly if
            # the device half lags (an eager pool.map buffered the whole
            # category, potentially GBs on the 1-core eval hosts)
            job_iter = iter(jobs)
            inflight: deque = deque()

            def fill():
                while len(inflight) < 2 * workers:
                    j = next(job_iter, None)
                    if j is None:
                        return
                    inflight.append(pool.submit(host_one, j))

            fill()
            while inflight:
                tag, payload, cpath, key = inflight.popleft().result()
                fill()
                if tag == "hit":
                    per_obj.append(payload)
                    continue
                if payload is None:
                    continue
                r = _object_device(payload, which, dim=dim)
                if cpath is not None:
                    _cache_store(cpath, key, r)
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
            # category-mean precision/recall (reference f_score_cat returns
            # exactly these two vectors + the object count)
            for k in ("f_precision", "f_recall"):
                vals = [o[k] for o in per_obj if k in o]
                if vals:
                    summary[k] = np.mean(np.asarray(vals), axis=0).tolist()
        results["categories"][cat] = summary
        total_objs += len(per_obj)
        for k, v in summary.items():
            if isinstance(v, float):
                weighted[k] = weighted.get(k, 0.0) + v * len(per_obj)
    results["overall"] = {k: v / max(total_objs, 1)
                          for k, v in weighted.items() if k != "objects"}
    # overall F-score: object-count-weighted average of the per-category
    # precision and recall vectors, THEN the harmonic mean — the exact
    # aggregate of /root/reference/test/test_f_score.py:176-181
    # (pre_w_avg/rec_w_avg via np.average(..., weights=cnt_lst))
    pcats = [(c, s) for c, s in results["categories"].items()
             if "f_precision" in s]
    if pcats:
        cnts = np.asarray([s["objects"] for _, s in pcats], np.float64)
        pre = np.average(np.asarray([s["f_precision"] for _, s in pcats]),
                         axis=0, weights=cnts)
        rec = np.average(np.asarray([s["f_recall"] for _, s in pcats]),
                         axis=0, weights=cnts)
        f1 = 2 * pre * rec / np.maximum(pre + rec, 1e-9)
        results["overall"]["f_precision"] = pre.tolist()
        results["overall"]["f_recall"] = rec.tolist()
        results["overall"]["f1"] = f1.tolist()
        results["overall"]["f1_thresholds_pct"] = list(F_THRESHOLDS)
    results["total_objects"] = total_objs
    return results
