"""Unified command-line interface.

The reference exposes one ad-hoc argparse script per task (train/train_sdf.py,
cam_est/train_sdf_cam.py, test/create_sdf.py, demo/demo.py, test/test_cd_emd
/ test_f_score / test_iou / test_sdf_acc, preprocessing/*, postprocessing/*).
Here the same surface is one typed-config CLI:

    python -m disn_tpu train          # SDF training (train_sdf.py)
    python -m disn_tpu train-cam      # camera training (+--test / --create)
    python -m disn_tpu create-sdf     # test-split reconstruction (create_sdf)
    python -m disn_tpu demo           # single image -> mesh (demo/demo.py)
    python -m disn_tpu evaluate       # cd/emd/f-score/iou/acc evaluators
    python -m disn_tpu preprocess-sdf # mesh -> SDF h5 (create_point_sdf_grid)
    python -m disn_tpu preprocess-img # renders -> view h5 (create_img_h5)
    python -m disn_tpu clean          # small-part mesh cleaning
    python -m disn_tpu synth          # build the synthetic fixture dataset

Every subcommand accepts --set key=value overrides of the typed Config
(disn_tpu/config.py), replacing the reference's ~40 flags per script.
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
from typing import Any

import numpy as np

from disn_tpu.config import CATS, Config, Variant


# --------------------------------------------------------------------------
# config plumbing
# --------------------------------------------------------------------------

def _coerce(field_type: Any, raw: str) -> Any:
    if field_type is bool or field_type == "bool":
        return raw.lower() in ("1", "true", "yes")
    if field_type is Variant:
        return Variant(raw)
    try:
        return field_type(raw)
    except Exception:
        return raw


def apply_overrides(cfg: Config, pairs: list[str]) -> Config:
    fields = {f.name: f.type for f in dataclasses.fields(Config)}
    kw = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        if key not in fields:
            raise SystemExit(f"unknown config key: {key}")
        current = getattr(cfg, key)
        kw[key] = _coerce(type(current), val)
    return cfg.replace(**kw)


def common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="override a Config field")
    p.add_argument("--log-dir", default="runs/default")
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu/tpu)")


def setup_jax(args) -> None:
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/disn_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def data_handles(cfg: Config, data_root: str, split: str, cam_est: bool = False):
    from disn_tpu.data import listing
    lst_dir = os.path.join(data_root, "filelists")
    if not os.path.isdir(lst_dir):
        # fall back to the bundled ShapeNet split lists (reference
        # data/filelists/*.lst) when the data tree doesn't carry its own
        lst_dir = listing.BUNDLED_FILELISTS
    renders = os.path.join(
        data_root, "renders_camest" if cam_est else "renders")
    cats = dict(CATS)
    # include any synthetic categories present in the filelists dir
    for f in glob.glob(os.path.join(lst_dir, f"*_{split}.lst")):
        cat = os.path.basename(f).rsplit("_", 1)[0]
        if cat not in cats.values():
            cats[cat] = cat
    listinfo, cats_limit = listing.load_split(lst_dir, cats, split,
                                              view_num=cfg.view_num)
    paths = listing.SplitPaths(os.path.join(data_root, "sdf"), renders)
    return listinfo, cats_limit, paths


# --------------------------------------------------------------------------
# subcommands
# --------------------------------------------------------------------------

def cmd_train(args) -> None:
    setup_jax(args)
    import jax
    from disn_tpu.data import pipeline
    from disn_tpu.models import disn
    from disn_tpu.parallel import batch_sharding
    from disn_tpu.parallel.mesh import fitting_mesh
    from disn_tpu.train import (checkpoint, create_state, make_train_step)
    from disn_tpu.train.trainer import make_eval_step
    from disn_tpu.utils import MetricLogger, Timer

    cfg = apply_overrides(Config(), args.set)
    logger = MetricLogger(args.log_dir)
    logger.log(f"config: {cfg.to_json()}")
    cfg.save(os.path.join(args.log_dir, "config.json"))

    listinfo, cats_limit, paths = data_handles(cfg, args.data_root, "train")
    mesh = fitting_mesh(cfg.batch_size)
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=args.epochs,
                                  sharding=batch_sharding(mesh, 1),
                                  workers=args.workers, seed=args.seed)
    state = create_state(cfg, jax.random.PRNGKey(args.seed))
    if args.resume:
        # elastic resume: full state (params + optimizer moments + step)
        path = args.resume if os.path.isfile(args.resume) else \
            os.path.join(args.resume, "latest.npz")
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = checkpoint.restore(path, target)
        state = state.replace(params=jax.device_put(restored["params"]),
                              opt_state=jax.device_put(restored["opt_state"]),
                              step=jax.device_put(restored["step"]))
        logger.log(f"resumed from {path} at step {int(state.step)}")
    if args.restore:
        donor = checkpoint.restore_params(args.restore)
        merged, skipped = checkpoint.merge_scopes(
            jax.tree_util.tree_map(np.asarray, state.params),
            donor.get("params", donor))
        logger.log(f"restored {args.restore}; skipped {len(skipped)} leaves")
        state = state.replace(params=jax.device_put(merged))
    if args.restore_cnn:
        donor = checkpoint.restore_params(args.restore_cnn)
        merged, skipped = checkpoint.merge_scopes(
            jax.tree_util.tree_map(np.asarray, state.params),
            donor.get("params", donor), scopes=("vgg_16",),
            skip_substr=("fc8",))
        logger.log(f"encoder init from {args.restore_cnn}; "
                   f"skipped {len(skipped)}")
        state = state.replace(params=jax.device_put(merged))

    step_fn = make_train_step(cfg)
    mgr = checkpoint.CheckpointManager(args.log_dir, period=10)
    timer = Timer()
    loader.start()
    bpe = loader.batches_per_epoch
    acc_sum, acc_n = 0.0, 0
    for i, batch in enumerate(loader):
        with timer.phase("step"):
            state, losses = step_fn(state, batch)
        # accumulate on device: a float() here would sync every step
        acc_sum = acc_sum + losses["accuracy"]
        acc_n += 1
        if i % args.log_every == 0:
            logger.metrics(i, losses)
            logger.log(timer.summary())
        if args.dump_every and i % args.dump_every == 0:
            _train_visual_dump(args.log_dir, i, cfg, state.params, batch)
        if (i + 1) % bpe == 0:
            epoch = (i + 1) // bpe
            params_host = jax.tree_util.tree_map(np.asarray, state.params)
            mgr.save_epoch({"params": params_host}, epoch,
                           metric=float(acc_sum) / max(acc_n, 1))
            mgr.save_latest({"params": params_host,
                             "opt_state": jax.tree_util.tree_map(
                                 np.asarray, state.opt_state),
                             "step": np.asarray(state.step)}, int(state.step))
            logger.log(f"epoch {epoch} done; "
                       f"acc {float(acc_sum) / max(acc_n, 1):.4f}")
            acc_sum, acc_n = 0.0, 0
    loader.shutdown()
    logger.close()


def _train_visual_dump(log_dir: str, step: int, cfg, params, batch) -> None:
    """Train-time camera-consistency visuals (train/train_sdf.py:403-428):
    projected sample points splatted on the input image + SDF-colored
    pred/gt point clouds."""
    import jax.numpy as jnp
    from disn_tpu.core import camera
    from disn_tpu.models import disn
    from disn_tpu.train.trainer import to_model_batch
    from disn_tpu.utils import output_utils

    host = {k: np.asarray(v) for k, v in batch.items()}
    d = os.path.join(log_dir, "dumps")
    px = np.asarray(camera.project_points(
        jnp.asarray(host["sdf_pt"][:1]), jnp.asarray(host["trans_mat"][:1]),
        img_w=cfg.img_w, img_h=cfg.img_h))[0]
    img = output_utils.draw_points_on_image(host["img"][0], px)
    output_utils.save_ppm(os.path.join(d, f"step{step:06d}_proj.ppm"), img)
    eps = disn.apply(params, to_model_batch(
        {k: jnp.asarray(v[:1]) for k, v in host.items()}), cfg)
    from disn_tpu.infer.dense import scale_pred
    pred = np.asarray(scale_pred(eps["pred_sdf"], cfg))[0]
    output_utils.save_scaled_point_cloud(
        os.path.join(d, f"step{step:06d}_pred.obj"), host["sdf_pt"][0], pred)
    output_utils.save_scaled_point_cloud(
        os.path.join(d, f"step{step:06d}_gt.obj"), host["sdf_pt"][0],
        host["sdf_val"][0, :, 0])


def cmd_train_cam(args) -> None:
    setup_jax(args)
    import jax
    from disn_tpu.data import pipeline
    from disn_tpu.models import posenet
    from disn_tpu.parallel import batch_sharding
    from disn_tpu.parallel.mesh import fitting_mesh
    from disn_tpu.train import checkpoint, create_state, make_cam_train_step
    from disn_tpu.utils import MetricLogger

    cfg = apply_overrides(Config(), args.set)
    logger = MetricLogger(args.log_dir, name="cam")
    listinfo, cats_limit, paths = data_handles(cfg, args.data_root, "train")
    state = create_state(cfg, jax.random.PRNGKey(args.seed),
                         init_fn=posenet.init)
    if args.restore:
        donor = checkpoint.restore_params(args.restore)
        merged, _ = checkpoint.merge_scopes(
            jax.tree_util.tree_map(np.asarray, state.params),
            donor.get("params", donor))
        state = state.replace(params=jax.device_put(merged))

    if args.mode == "create":
        _cam_create_h5(args, cfg, state.params, logger)
        return
    if args.mode == "test":
        _cam_eval(args, cfg, state.params, logger)
        return

    mesh = fitting_mesh(cfg.batch_size)
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=args.epochs,
                                  sharding=batch_sharding(mesh, 1),
                                  workers=args.workers, seed=args.seed)
    step_fn = make_cam_train_step(cfg)
    mgr = checkpoint.CheckpointManager(args.log_dir, period=10)
    loader.start()
    for i, batch in enumerate(loader):
        cam_batch = {"img": batch["img"][..., :3],
                     "sample_pc": batch["sdf_pt"],
                     "RT": batch["regress_mat"],
                     "trans_mat": batch["trans_mat"]}
        if "shifts" in batch:
            cam_batch["shifts"] = batch["shifts"]
        state, losses = step_fn(state, cam_batch)
        if i % args.log_every == 0:
            logger.metrics(i, losses)
        if i % 1000 == 999:  # latest.ckpt cadence (train_sdf_cam.py:418-421)
            mgr.save_latest({"params": jax.tree_util.tree_map(
                np.asarray, state.params)}, int(state.step))
    loader.shutdown()
    logger.close()


def _cam_batches(args, cfg, readers=None, window: int = 64):
    """Yield ((cat,obj,view), ViewRecord) over the split; with a reader
    pool, h5 reads (gzip decompress — the host CPU cost) prefetch in a
    bounded sliding window ahead of the consumer."""
    from collections import deque

    from disn_tpu.core import codecs
    listinfo, _, paths = data_handles(cfg, args.data_root, args.split)
    if readers is None:
        for cat_id, obj, view in listinfo:
            rec = codecs.read_view_h5(paths.img_path(cat_id, obj, view))
            yield (cat_id, obj, view), rec
        return
    pending: deque = deque()
    it = iter(listinfo)
    while True:
        while len(pending) < window:
            key = next(it, None)
            if key is None:
                break
            pending.append((key, readers.submit(
                codecs.read_view_h5, paths.img_path(*key))))
        if not pending:
            return
        key, fut = pending.popleft()
        yield key, fut.result()


def _cam_eval(args, cfg, params, logger) -> None:
    """--mode test: the reference eval_one_epoch protocol
    (cam_est/train_sdf_cam.py:459-565) — run the FULL cam loss graph over
    the split's batches (real sampled SDF points, RT, trans_mat; not probe
    grids), accumulate every loss, and report avg plus the avg/max/min of
    the per-batch rot2d/rot3d point distances. Batches come through the
    training pipeline's prefetching multi-worker loader instead of a
    serial per-view h5 loop."""
    import jax
    from disn_tpu.data import pipeline
    from disn_tpu.models import posenet

    listinfo, cats_limit, paths = data_handles(cfg, args.data_root,
                                               args.split)
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=1, shuffle=False,
                                  workers=args.workers, seed=args.seed)

    @jax.jit
    def eval_step(params, batch):
        end_points = posenet.apply(params, batch["img"][..., :3], cfg)
        _, losses = posenet.get_loss(end_points, batch, params, cfg)
        return losses

    sums: dict[str, float] = {}
    d2_lst, d3_lst = [], []
    n = 0
    loader.start()
    for batch in loader:
        cam_batch = {"img": batch["img"][..., :3],
                     "sample_pc": batch["sdf_pt"],
                     "RT": batch["regress_mat"],
                     "trans_mat": batch["trans_mat"]}
        if "shifts" in batch:
            cam_batch["shifts"] = batch["shifts"]
        losses = jax.device_get(eval_step(params, cam_batch))
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        d2_lst.append(float(losses["rot2d_dist"]))
        d3_lst.append(float(losses["rot3d_dist"]))
        n += 1
    loader.shutdown()
    if n == 0:
        logger.log("cam eval: empty split")
        return
    for k in sorted(sums):
        logger.log(f"cam eval {k}: {sums[k] / n:.6f}")
    d2, d3 = np.asarray(d2_lst), np.asarray(d3_lst)
    logger.log(f"avg 2d dist {d2.mean():.6f}, max 2d dist {d2.max():.6f}, "
               f"min 2d dist {d2.min():.6f}")
    logger.log(f"avg 3d dist {d3.mean():.6f}, max 3d dist {d3.max():.6f}, "
               f"min 3d dist {d3.min():.6f}")


def _cam_create_h5(args, cfg, params, logger, batch: int = 64) -> None:
    """--create: rewrite the view-h5 tree with predicted trans_mat
    (train_sdf_cam.py:568-612) -> renders_camest/.

    BATCHED (round 5): the old per-view jitted forward paid one ~26 ms
    tunnel sync per view — a full 13-class split (~409k views) was ~3 h
    of pure RTT. Views now ride ONE jitted B=64 forward (the reference is
    also per-view, but co-located); h5 reads prefetch on a reader pool,
    h5 writes (gzip — the real CPU cost) land on a writer pool, and a
    depth-2 in-flight window overlaps fetch(k) with compute(k+1). The
    final partial batch pads to B so there is exactly one compile."""
    import jax
    import jax.numpy as jnp
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from disn_tpu.core import codecs
    from disn_tpu.models import posenet

    apply_fn = jax.jit(
        lambda p, img: posenet.apply(p, img, cfg)["pred_trans_mat"])
    out_root = os.path.join(args.data_root, "renders_camest")
    n = 0

    def flush(entry) -> list:
        preds_d, metas, recs = entry
        preds = np.asarray(preds_d).astype(np.float32)
        futs = []
        for (cat_id, obj, view), rec, pred in zip(metas, recs, preds):
            new_rec = codecs.ViewRecord(
                img_arr=rec.img_arr, trans_mat=pred, K=rec.K, RT=rec.RT,
                obj_rot_mat=rec.obj_rot_mat, regress_mat=rec.regress_mat)
            futs.append(writers.submit(
                codecs.write_view_h5,
                os.path.join(out_root, cat_id, obj, f"{view:02d}.h5"),
                new_rec))
        return futs

    inflight: deque = deque()
    write_futs: list = []
    with ThreadPoolExecutor(2) as writers, \
            ThreadPoolExecutor(2) as readers:
        metas, recs, imgs = [], [], []

        def dispatch():
            nonlocal metas, recs, imgs
            bimgs = imgs
            if len(bimgs) < batch:  # pad to the compiled shape
                bimgs = bimgs + [bimgs[-1]] * (batch - len(bimgs))
            preds_d = apply_fn(params, jnp.asarray(np.stack(bimgs)))
            inflight.append((preds_d, metas, recs))
            metas, recs, imgs = [], [], []
            if len(inflight) > 2:
                write_futs.extend(flush(inflight.popleft()))

        for meta, rec in _cam_batches(args, cfg, readers=readers,
                                      window=2 * batch):
            metas.append(meta)
            recs.append(rec)
            imgs.append(rec.img_arr[:, :, :3])  # u8: normalized on-device
            n += 1
            if len(imgs) == batch:
                dispatch()
        if imgs:
            dispatch()
        while inflight:
            write_futs.extend(flush(inflight.popleft()))
        for f in write_futs:
            f.result()
    logger.log(f"wrote {n} estimated-camera view h5s to {out_root}")


def cmd_create_sdf(args) -> None:
    setup_jax(args)
    from disn_tpu.infer import pipeline as infer_pipeline
    from disn_tpu.train import checkpoint
    from disn_tpu.utils import MetricLogger

    cfg = apply_overrides(Config(), args.set)
    logger = MetricLogger(args.log_dir, name="test")
    listinfo, _, paths = data_handles(cfg, args.data_root, args.split,
                                      cam_est=args.cam_est)
    if args.shards > 1:  # eval farm: disjoint object stripes per worker
        listinfo = listinfo[args.shard::args.shards]
        logger.log(f"shard {args.shard}/{args.shards}: "
                   f"{len(listinfo)} views")
    donor = checkpoint.restore_params(args.restore)
    params = donor.get("params", donor)
    if args.multi_view:
        written = infer_pipeline.reconstruct_multiview(
            params, cfg, paths, listinfo, args.log_dir, logger=logger)
    else:
        written = infer_pipeline.reconstruct_split(
            params, cfg, paths, listinfo, args.log_dir, cam_est=args.cam_est,
            sparse=not args.dense, logger=logger)
    logger.log(f"wrote {len(written)} meshes")
    logger.close()


def cmd_demo(args) -> None:
    setup_jax(args)
    from disn_tpu.core import codecs
    from disn_tpu.infer import pipeline as infer_pipeline
    from disn_tpu.train import checkpoint
    from disn_tpu.utils import MetricLogger

    cfg = apply_overrides(Config(), args.set)
    logger = MetricLogger(None)
    if args.image.endswith(".h5"):
        rec = codecs.read_view_h5(args.image)
        img = rec.img_arr[:, :, :cfg.img_channels]  # u8: on-device /255
        trans = rec.trans_mat
    else:
        from PIL import Image
        arr = np.asarray(Image.open(args.image).convert(
            "RGBA" if cfg.alpha else "RGB"), np.float32) / 255.0
        img = arr
        trans = None
    if args.trans_mat:
        # GT-camera path for a plain PNG: a 4x3 text matrix, like the
        # reference's hard-coded demo camera (demo/demo.py:272-276; the
        # bundled demo/chair_trans_mat.txt carries those exact values
        # for demo/chair.png)
        trans = np.loadtxt(args.trans_mat, dtype=np.float32,
                           comments="#").reshape(4, 3)
    if args.cam_est or trans is None:
        cam_restore = args.cam_restore
        if not cam_restore and cfg.width_mult == 0.25 \
                and cfg.num_classes == 128:
            # bundled synthetic posenet: the reference demo's two-graph
            # contract works out of the box (demo/demo.py:195-258) — but
            # ONLY at its own training config: at any other width the
            # shapes don't even match, and silently estimating a real
            # photo's camera with a toy net would mislead (round-3 review)
            bundled = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "demo", "tiny_posenet.npz")
            if os.path.exists(bundled):
                cam_restore = bundled
                logger.log(f"using bundled posenet checkpoint {bundled} "
                           "(synthetically trained; pass --cam-restore "
                           "for a real one)")
        if not cam_restore:
            raise SystemExit(
                "a plain image carries no camera: pass --trans-mat "
                "<4x3 txt> or --cam-restore <posenet ckpt> (or use a "
                "view .h5 with a trans_mat)")
        import jax
        import jax.numpy as jnp
        from disn_tpu.models import posenet
        cam_donor = checkpoint.restore_params(cam_restore)
        cam_params = cam_donor.get("params", cam_donor)
        out = posenet.apply(cam_params, jnp.asarray(img[None, :, :, :3]), cfg)
        trans = np.asarray(out["pred_trans_mat"])[0]
        logger.log("camera estimated by posenet")
    donor = checkpoint.restore_params(args.restore)
    params = donor.get("params", donor)
    verts, faces = infer_pipeline.image_to_mesh(
        params, img, trans, cfg, sparse=not args.dense, clean=args.clean)
    codecs.write_obj(args.out, verts, faces)
    logger.log(f"wrote {args.out}: {len(verts)} verts, {len(faces)} faces")


def cmd_evaluate(args) -> None:
    setup_jax(args)
    from disn_tpu.eval import runner
    results = runner.evaluate_tree(
        pred_dir=args.pred_dir, gt_dir=args.gt_dir,
        lst_dir=os.path.join(args.data_root, "filelists"),
        split=args.split, metrics=args.metrics.split(","),
        num_points=args.num_points, view_num=args.view_num,
        dim=args.dim, protocol=args.protocol, device_iou=args.device_iou,
        cache_dir=args.cache_dir)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


def cmd_evaluate_acc(args) -> None:
    """SDF accuracy / loss on held-out sampled points (test/test_sdf_acc.py
    equivalent): runs the metric-only eval step over a split."""
    setup_jax(args)
    import jax
    from disn_tpu.data import pipeline
    from disn_tpu.train import checkpoint
    from disn_tpu.train.trainer import make_eval_step
    from disn_tpu.utils import MetricLogger

    cfg = apply_overrides(Config(), args.set)
    logger = MetricLogger(args.log_dir, name="acc")
    listinfo, cats_limit, paths = data_handles(cfg, args.data_root,
                                               args.split)
    donor = checkpoint.restore_params(args.restore)
    params = jax.device_put(donor.get("params", donor))
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=1, shuffle=False, workers=4)
    ev = make_eval_step(cfg)
    loader.start()
    sums: dict[str, float] = {}
    n = 0
    for batch in loader:
        losses = ev(params, batch)
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    loader.shutdown()
    avg = {k: v / max(n, 1) for k, v in sums.items()}
    logger.log(json.dumps(avg, indent=2))
    logger.close()


def cmd_preprocess_sdf(args) -> None:
    from concurrent.futures import ProcessPoolExecutor
    from disn_tpu.core import codecs
    from disn_tpu.preprocessing import sdf_gen

    jobs = []
    for obj_path in sorted(glob.glob(args.pattern)):
        rel = os.path.splitext(os.path.basename(obj_path))[0]
        out_dir = os.path.join(args.out_dir, rel)
        jobs.append((obj_path, out_dir))

    def run(job):
        obj_path, out_dir = job
        verts, faces = codecs.read_obj(obj_path)
        return sdf_gen.generate_object(
            verts, faces, out_dir, cat_id=args.cat_id, sdf_res=args.res,
            num_sample=args.num_sample)

    if args.jobs > 1:
        with ProcessPoolExecutor(args.jobs) as pool:
            for r in pool.map(run, jobs):
                print(r)
    else:
        for job in jobs:
            print(run(job))


def cmd_preprocess_img(args) -> None:
    from PIL import Image
    from disn_tpu.core import codecs
    from disn_tpu.preprocessing import img_gen

    meta = img_gen.parse_render_metadata(args.metadata)
    images = []
    for p in sorted(glob.glob(args.pattern)):
        images.append(np.asarray(Image.open(p).convert("RGBA"), np.uint8))
    sdf = codecs.read_sdf_h5(args.sdf_h5)
    paths = img_gen.generate_object_views(images, meta, sdf.norm_params,
                                          args.out_dir)
    print(f"wrote {len(paths)} view h5s")


def cmd_clean(args) -> None:
    from disn_tpu.postprocessing import clean_mesh_file
    for src in sorted(glob.glob(args.pattern)):
        dst = src if args.in_place else src.replace(".obj", "_clean.obj")
        clean_mesh_file(src, dst, vert_ratio=args.vert_ratio,
                        center_dist=args.center_dist)
        print(f"cleaned {src} -> {dst}")


def cmd_convert_ckpt(args) -> None:
    """TF1 bundle checkpoint -> disn_tpu npz (convert/tf_ckpt.py)."""
    from disn_tpu.convert import convert_checkpoint
    params = convert_checkpoint(args.tf_prefix, args.out)
    n = sum(1 for _ in _walk_leaves(params))
    print(f"converted {n} tensors from {args.tf_prefix} -> {args.out}")


def _walk_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk_leaves(v)
        else:
            yield v


def cmd_synth(args) -> None:
    from disn_tpu.data import synthetic
    info = synthetic.build_dataset(args.out_dir, views=args.views,
                                   num_samples=args.num_samples,
                                   grid_res=args.grid_res)
    print(json.dumps({k: v for k, v in info.items()
                      if isinstance(v, (str, int))}, indent=2))


# --------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("disn_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="SDF training")
    common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--dump-every", type=int, default=4000,
                   help="visual dump cadence (0 disables)")
    p.add_argument("--restore", default=None)
    p.add_argument("--restore-cnn", default=None,
                   help="encoder-only init (skips fc8), like --restore_modelcnn")
    p.add_argument("--resume", default=None,
                   help="full-state resume (params+optimizer+step) from a "
                        "checkpoint file or a run dir's latest.npz")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-cam", help="camera pose training / eval / h5")
    common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--mode", choices=["train", "test", "create"],
                   default="train")
    p.add_argument("--split", default="test")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--restore", default=None)
    p.set_defaults(fn=cmd_train_cam)

    p = sub.add_parser("create-sdf", help="test-split reconstruction")
    common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--restore", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--cam-est", action="store_true")
    p.add_argument("--dense", action="store_true",
                   help="exact dense path (default: sparse two-level)")
    p.add_argument("--shard", type=int, default=0,
                   help="this worker's index in a reconstruction farm")
    p.add_argument("--shards", type=int, default=1,
                   help="total farm workers (launch one process per chip)")
    p.add_argument("--multi-view", action="store_true",
                   help="fuse all views per object (feature averaging)")
    p.set_defaults(fn=cmd_create_sdf)

    p = sub.add_parser("demo", help="single image -> mesh")
    common_args(p)
    p.add_argument("--image", required=True, help="png or view h5")
    p.add_argument("--restore", required=True)
    p.add_argument("--trans-mat", default=None,
                   help="4x3 world->pixel matrix txt for a plain png "
                        "(e.g. demo/chair_trans_mat.txt)")
    p.add_argument("--cam-est", action="store_true")
    p.add_argument("--cam-restore", default=None)
    p.add_argument("--dense", action="store_true")
    p.add_argument("--clean", action="store_true")
    p.add_argument("--out", default="result.obj")
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("evaluate", help="cd/emd/f-score/iou over a result tree")
    common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--metrics", default="cd,emd,fscore,iou")
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--view-num", type=int, default=24)
    p.add_argument("--dim", type=int, default=110)
    p.add_argument("--protocol", choices=["vertices", "surface"],
                   default="vertices",
                   help="point sampling: reference protocol (vertices) or "
                        "uniform surface sampling")
    p.add_argument("--device-iou", action="store_true",
                   help="voxelize on device (fast on single-core hosts)")
    p.add_argument("--cache-dir", default=None,
                   help="per-object metric cache: a killed full-split eval "
                        "resumes, skipping finished objects (reference "
                        "caches NN distances, test_f_score.py:203-231)")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("evaluate-acc",
                       help="SDF sign-accuracy/loss on held-out points")
    common_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--restore", required=True)
    p.add_argument("--split", default="test")
    p.set_defaults(fn=cmd_evaluate_acc)

    p = sub.add_parser("preprocess-sdf")
    p.add_argument("--pattern", required=True, help="glob of input .obj files")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cat-id", default="")
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--num-sample", type=int, default=32768)
    p.add_argument("--jobs", type=int, default=1)
    p.set_defaults(fn=cmd_preprocess_sdf)

    p = sub.add_parser("preprocess-img")
    p.add_argument("--pattern", required=True, help="glob of view pngs")
    p.add_argument("--metadata", required=True)
    p.add_argument("--sdf-h5", required=True)
    p.add_argument("--out-dir", required=True)
    p.set_defaults(fn=cmd_preprocess_img)

    p = sub.add_parser("clean")
    p.add_argument("--pattern", required=True)
    p.add_argument("--in-place", action="store_true")
    p.add_argument("--vert-ratio", type=float, default=0.3)
    p.add_argument("--center-dist", type=float, default=0.5)
    p.set_defaults(fn=cmd_clean)

    p = sub.add_parser("convert-ckpt",
                       help="convert a TF1 bundle checkpoint to npz")
    p.add_argument("--tf-prefix", required=True,
                   help="TF checkpoint prefix (model.ckpt of .index/.data)")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_convert_ckpt)

    p = sub.add_parser("synth")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--num-samples", type=int, default=8192)
    p.add_argument("--grid-res", type=int, default=32)
    p.set_defaults(fn=cmd_synth)
    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)
