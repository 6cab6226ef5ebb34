"""Full-split evaluation wall-clock rehearsal on synthetic data.

The reference's acceptance protocol evaluates 13 cats x ~1.3k objects x 24
views through CD/EMD (test/test_cd_emd.py), F-score (test_f_score.py), and
IoU at dim=110 on a 12-way joblib pool (test_iou.py:193-197). Nobody had
measured OUR evaluator (eval/runner.evaluate_tree) at production mesh sizes
end to end (round-3 verdict weak #6/#7): this script builds a synthetic
split of production-sized meshes (the fused 257^3 pipeline's reconstructions,
~351k tris each), runs every metric, and reports objs/min + the per-metric
breakdown, extrapolated to the chair test split (1311 objs x 24 views).

Usage: python scripts/eval_rehearsal.py [n_objs] [view_num]
Writes the tree to /dev/shm/eval_rehearsal (the block device is
cgroup-throttled to ~15 MB/s; /dev/shm is RAM).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ROOT = "/dev/shm/eval_rehearsal"


def build_tree(n_objs: int, view_num: int) -> tuple[str, str, str]:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from disn_tpu.config import Config
    from disn_tpu.core import codecs
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=64, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    trans = synthetic.demo_trans_mat()
    rng = np.random.RandomState(0)

    pred_dir = os.path.join(ROOT, "pred")
    gt_dir = os.path.join(ROOT, "gt")
    lst_dir = os.path.join(ROOT, "lists")
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(lst_dir)

    cats = ("03001627", "04379243")
    per_cat = -(-n_objs // len(cats))
    t0 = time.perf_counter()
    n_done = 0
    for ci, cat in enumerate(cats):
        objs = []
        for oi in range(per_cat):
            if n_done >= n_objs:
                break
            obj = f"obj{oi:03d}"
            objs.append(obj)
            r = 0.45 + 0.5 * ((ci * per_cat + oi) % 5) / 4.0
            params = synthetic.analytic_octahedron_params(cfg, r=r)
            img = rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
            verts, faces = pipeline.image_to_mesh(params, img, trans, cfg)
            # GT tree: {gt}/{cat}/{obj}/isosurf.obj
            codecs.write_obj(
                os.path.join(gt_dir, cat, obj, "isosurf.obj"), verts, faces)
            # pred tree: {pred}/{cat}/{cat}_{obj}_{view:02d}.obj — view
            # meshes are COPIES (parse/metric cost depends on size, not
            # content; reconstructing 24 real views would measure the farm,
            # which bench_farm.py already does)
            v0 = os.path.join(pred_dir, cat, f"{cat}_{obj}_00.obj")
            codecs.write_obj(v0, verts, faces)
            for v in range(1, view_num):
                shutil.copyfile(v0, os.path.join(
                    pred_dir, cat, f"{cat}_{obj}_{v:02d}.obj"))
            n_done += 1
            print(f"built {cat}/{obj} r={r:.2f} "
                  f"({len(faces)} tris)", flush=True)
        with open(os.path.join(lst_dir, f"{cat}_test.lst"), "w") as f:
            f.write("\n".join(objs) + "\n")
    print(f"tree build: {time.perf_counter() - t0:.1f} s "
          f"({n_done} objs x {view_num} views)", flush=True)
    return pred_dir, gt_dir, lst_dir


def main() -> None:
    n_objs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    view_num = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    if "reuse" in sys.argv and os.path.isdir(os.path.join(ROOT, "pred")):
        pred_dir = os.path.join(ROOT, "pred")
        gt_dir = os.path.join(ROOT, "gt")
        lst_dir = os.path.join(ROOT, "lists")
        shutil.rmtree(os.path.join(ROOT, "cache"), ignore_errors=True)
        print("reusing existing tree", flush=True)
    else:
        pred_dir, gt_dir, lst_dir = build_tree(n_objs, view_num)

    from disn_tpu.eval import runner

    def timed(name, which, **kw):
        t0 = time.perf_counter()
        res = runner.evaluate_tree(pred_dir, gt_dir, lst_dir,
                                   metrics=list(which), view_num=view_num,
                                   **kw)
        dt = time.perf_counter() - t0
        n = res["total_objects"]
        rate = n / dt * 60
        full = 1311 / rate * 60  # chair test split, minutes -> seconds
        print(f"{name}: {dt:.1f} s for {n} objs = {rate:.1f} objs/min "
              f"(1311-obj split ~ {full / 60:.0f} min)", flush=True)
        return res, dt

    # metric-by-metric breakdown, then the full protocol. The device-voxel
    # arm is OFF by default: through the tunnel from the evaluator's
    # 8-thread pool it measured 10x SLOWER than host voxelization (784 vs
    # 76 s / 8 objs, round 4) — pass 'device-iou' to re-measure.
    timed("cd+emd            ", {"cd", "emd"})
    timed("fscore            ", {"fscore"})
    timed("iou (host voxel)  ", {"iou"})
    if "device-iou" in sys.argv:
        timed("iou (device voxel)", {"iou"}, device_iou=True)
    res, dt = timed("FULL cd,emd,fscore,iou", {"cd", "emd", "fscore", "iou"})
    ov = res["overall"]
    print(f"overall: cd_avg={ov.get('cd_avg'):.4f} "
          f"emd_avg={ov.get('emd_avg'):.4f} iou_avg={ov.get('iou_avg'):.4f} "
          f"f1@2%={ov['f1'][2]:.4f}", flush=True)
    # resume rehearsal: a cached re-run must be near-instant
    cache = os.path.join(ROOT, "cache")
    t0 = time.perf_counter()
    runner.evaluate_tree(pred_dir, gt_dir, lst_dir,
                         metrics=["cd", "emd", "fscore", "iou"],
                         view_num=view_num, cache_dir=cache)
    warm = runner.evaluate_tree(pred_dir, gt_dir, lst_dir,
                                metrics=["cd", "emd", "fscore", "iou"],
                                view_num=view_num, cache_dir=cache)
    t1 = time.perf_counter()
    print(f"cached re-run of the full protocol: "
          f"{(t1 - t0) / 2:.1f} s avg (resume works: "
          f"{warm['total_objects']} objs)", flush=True)


if __name__ == "__main__":
    main()
