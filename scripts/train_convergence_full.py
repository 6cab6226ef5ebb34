"""Full-width synthetic convergence artifact (round-4 verdict item 6):
train the PRODUCTION config (full-width two-stream VGG, bf16 compute,
folded-137 sampling, B=20) from scratch on the analytic fixture through
the production loader, then reconstruct through the production
image->mesh pipeline and score CD against the analytic ground-truth
mesh — proving the trained path end to end at full width on real
hardware.

The fixture's renders encode shape identity (distinct silhouettes per
analytic SDF), so the net must actually learn image->field. Pass bar:
sign accuracy >= 0.9 and CD*1000 within an order of magnitude of the
closed-loop noise floor (~0.75; a fresh random net reads >100).

Usage: python scripts/train_convergence_full.py [--steps 1500]
       [--sdf-res 128] [--json OUT]
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import tpu_reachable  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--sdf-res", type=int, default=128)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if not tpu_reachable():
        print("train_convergence_full: TPU unreachable — SKIPPED")
        return 3
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from disn_tpu.config import Config
    from disn_tpu.core import codecs
    from disn_tpu.data import listing, pipeline as data_pipeline, synthetic
    from disn_tpu.eval import metrics
    from disn_tpu.infer import pipeline as infer_pipeline
    from disn_tpu.ops import marching
    from disn_tpu.train import create_state, make_train_step

    root = "/dev/shm/conv_full_ds"
    shutil.rmtree(root, ignore_errors=True)
    info = synthetic.build_dataset(root, views=4, num_samples=16384,
                                   grid_res=65)
    cfg = Config(compute_dtype="bfloat16", sdf_res=args.sdf_res,
                 view_num=4)
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=4)
    reps = -(-(args.steps + 4) * cfg.batch_size // max(1, len(listinfo)))
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    loader = data_pipeline.make_loader(
        cfg, paths, listinfo * reps,
        {k: v * reps for k, v in cats_limit.items()},
        epochs=1, workers=3, seed=0)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    loader.start()
    it = iter(loader)
    t0 = time.perf_counter()
    losses = {}
    for i in range(args.steps):
        state, losses = step_fn(state, next(it))
        if i % 200 == 0:
            print(f"step {i}: loss={float(losses['overall_loss']):.1f} "
                  f"acc={float(losses['accuracy']):.3f}", flush=True)
    acc = float(losses["accuracy"])
    dt = time.perf_counter() - t0
    loader.shutdown()
    print(f"trained {args.steps} steps in {dt:.0f} s "
          f"({args.steps / dt:.1f} steps/s); final sign acc {acc:.3f}",
          flush=True)

    # reconstruct one training view through the production pipeline
    cat_id, obj, view = listinfo[0]
    rec = codecs.read_view_h5(paths.img_path(cat_id, obj, view))
    sdfp = codecs.read_sdf_params(paths.sdf_path(cat_id, obj))
    img = rec.img_arr[:, :, :cfg.img_channels]
    verts, faces = infer_pipeline.image_to_mesh(
        state.params, img, rec.trans_mat, cfg, sdf_params=sdfp)
    print(f"reconstructed {cat_id}/{obj}: {len(verts)} verts "
          f"{len(faces)} tris", flush=True)
    assert len(faces) > 500, "degenerate reconstruction"

    # analytic GT mesh at the same grid for CD
    fn = None
    for name, f in synthetic.SHAPES.items():
        if obj.startswith(name):
            fn = f
            break
    assert fn is not None, obj
    R = cfg.grid_resolution
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    gt_vol = fn(np.stack([xx, yy, zz], axis=-1)).astype(np.float32)
    gv, gf = marching.extract_mesh(gt_vol, sdfp, iso=cfg.iso)

    rng = np.random.RandomState(0)

    def surf_sample(v, f, n=30000):
        tri = v[f]
        areas = np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
        idx = rng.choice(len(f), n, p=areas / areas.sum())
        a, b = rng.rand(n, 1), rng.rand(n, 1)
        flip = (a + b) > 1
        a, b = np.where(flip, 1 - a, a), np.where(flip, 1 - b, b)
        t = tri[idx]
        return (t[:, 0] + a * (t[:, 1] - t[:, 0])
                + b * (t[:, 2] - t[:, 0])).astype(np.float32)

    import jax.numpy as jnp
    pa = surf_sample(verts, faces)
    pb = surf_sample(gv, gf)
    d1, _, d2, _ = metrics.nn_distance(jnp.asarray(pa[None]),
                                       jnp.asarray(pb[None]))
    cd = float((jnp.mean(d1) + jnp.mean(d2)) * 1000.0)
    print(f"CD*1000 vs analytic GT: {cd:.3f} (sign acc {acc:.3f})",
          flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"steps": args.steps, "sign_acc": acc,
                       "cd_x1000": cd, "tris": int(len(faces)),
                       "steps_per_s": args.steps / dt,
                       "sdf_res": args.sdf_res}, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
