"""Closed-loop metric parity: the PRODUCTION image->mesh pipeline at 257^3
vs ANALYTIC ground truth, through the full reference metric protocol
(CD x1000 / EMD x0.01 per test/test_cd_emd.py:300-313, F-score thresholds
{0.5..20}% x 2.5 per test/test_f_score.py:159-181, IoU dim=110 per
test/test_iou.py:208-233).

Until the reference release assets (ShapeNet + SDF_DISN ckpt) reach this
machine, this is the parity evidence: the analytic-octahedron decoder lets
the whole production path (bf16 fused Pallas kernel, dynamic sparse cull,
record-mode extraction, native assembly) be scored against EXACT geometry.

Two rows, mirroring the reference demo's two camera modes
(demo/demo.py:195-258, 272-276):
  gt-cam : the GT trans_mat feeds image_to_mesh directly
  cam-est: the bundled posenet (demo/tiny_posenet.npz, reference
           cam_est/model_cam.py heads) estimates pred_trans_mat from a
           synthetic render, and THAT matrix feeds the same pipeline;
           camera error (rot3d / reprojection px, the reference's eval
           distances) is reported alongside the mesh metrics

Measured (TPU v5e-1, round 3, gt-cam row): pred mesh is structurally
identical to the analytic marching-cubes mesh (175,574 verts / 351,144
tris both), IoU=1.0, CD*1000 = 0.7796 vs a 0.7458 same-mesh two-sampling
noise floor, EMD*0.01 = 0.8965 vs 0.8967 floor: the pipeline is
metric-exact. Round-4 cam-est row in BASELINE.md.

Run: python scripts/closed_loop_parity.py            (both rows)
     python scripts/closed_loop_parity.py gt-cam     (one row)
     python scripts/closed_loop_parity.py cam-est
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.data import synthetic
from disn_tpu.infer import pipeline
from disn_tpu.ops import marching, voxelize
from disn_tpu.eval import metrics

SDFP = np.array([-1, -1, -1, 1, 1, 1], np.float32)


def score_vs_analytic(pv, pf, label: str) -> None:
    """Score a predicted octahedron mesh against the EXACT analytic field
    through the complete reference metric protocol."""
    lin = np.linspace(-1, 1, 257, dtype=np.float32)
    Z, Y, X = np.meshgrid(lin, lin, lin, indexing="ij")
    gt_field = (np.abs(X) + np.abs(Y) + np.abs(Z) - 0.6).astype(np.float32)
    gv, gf = marching.extract_mesh_owned(gt_field, SDFP)
    print(f"[{label}] gt mesh: {len(gv)} verts {len(gf)} tris")

    ps = metrics.sample_mesh_surface(np.asarray(pv, np.float32),
                                     np.asarray(pf), 2048,
                                     np.random.RandomState(0))
    gs = metrics.sample_mesh_surface(np.asarray(gv, np.float32),
                                     np.asarray(gf), 2048,
                                     np.random.RandomState(1))
    # noise floor: two independent samplings of the SAME gt mesh
    gs0 = metrics.sample_mesh_surface(np.asarray(gv, np.float32),
                                      np.asarray(gf), 2048,
                                      np.random.RandomState(0))
    psj, gsj = jnp.asarray(ps[None]), jnp.asarray(gs[None])
    ce = metrics.chamfer_emd(psj, gsj)
    floor = metrics.chamfer_emd(jnp.asarray(gs0[None]), gsj)
    ths = np.array([0.5, 1, 2, 5, 10, 20]) * 0.01 * 2.5
    fs = metrics.f_score(psj, gsj, ths)
    f1 = np.asarray(fs["f1"])[:, 0]
    iou = voxelize.iou_meshes((np.asarray(pv), np.asarray(pf)),
                              (np.asarray(gv), np.asarray(gf)), dim=110)
    print(f"[{label}] CD*1000={float(ce['cd'][0]):.4f} (noise floor "
          f"{float(floor['cd'][0]):.4f})  EMD*0.01={float(ce['emd'][0]):.4f} "
          f"(floor {float(floor['emd'][0]):.4f})  IoU(110)={iou:.4f}")
    print(f"[{label}] F1 @ {{0.5,1,2,5,10,20}}%x2.5: "
          + " ".join(f"{v:.4f}" for v in f1))


def run_gt_cam() -> None:
    """GT-camera row: the round-3 closed loop, unchanged."""
    cfg = Config(sdf_res=256, compute_dtype="bfloat16")
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    img = rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()

    t0 = time.perf_counter()
    pv, pf = pipeline.image_to_mesh(params, img, trans, cfg,
                                    sdf_params=SDFP)
    print(f"[gt-cam] pred mesh: {len(pv)} verts {len(pf)} tris "
          f"({time.perf_counter() - t0:.2f}s incl compile)")
    score_vs_analytic(pv, pf, "gt-cam")


def run_cam_est() -> None:
    """Estimated-camera row: posenet -> pred_trans_mat -> the SAME
    production pipeline (demo/demo.py:195-258's two-graph contract).

    The bundled posenet (demo/tiny_posenet.npz, width 0.25 / 128 classes —
    demo/make_assets.py) estimates the camera of a synthetic render from
    its own training distribution; the analytic decoder at the same width
    then reconstructs through image_to_mesh with the PREDICTED matrix.
    Camera error is reported with the reference eval distances (rot3d =
    mean homo-pc transform gap, rot2d = mean clamped reprojection px gap —
    cam_est/model_cam.py:125-239)."""
    from disn_tpu.core import camera
    from disn_tpu.models import posenet
    from disn_tpu.train import checkpoint

    cfg = Config(sdf_res=256, compute_dtype="bfloat16",
                 width_mult=0.25, num_classes=128)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    donor = checkpoint.restore_params(os.path.join(root, "demo",
                                                   "tiny_posenet.npz"))
    cam_params = donor.get("params", donor)

    # a view from the posenet's training distribution (make_assets.py:
    # el=25, dist 0.85, az in 10 + k*45) but an UNSEEN azimuth
    img8, rec = synthetic.render_view(synthetic.SHAPES["torus0"],
                                      az=152.0, el=25.0,
                                      distance_ratio=0.85)
    img = img8[..., :3].astype(np.float32) / 255.0
    out = posenet.apply(cam_params, jnp.asarray(img[None]), cfg)
    pred_trans = np.asarray(out["pred_trans_mat"])[0].astype(np.float32)
    pred_RT = np.asarray(out["pred_RT"])[0]

    # reference eval distances on the octahedron's surface points
    pc = synthetic.surface_points(synthetic.SHAPES["torus0"], num=2048,
                                  rng=np.random.RandomState(7))
    homo = np.concatenate([pc, np.ones((len(pc), 1), np.float32)], axis=1)
    rot3d = float(np.mean(np.linalg.norm(
        homo @ pred_RT - homo @ rec.regress_mat, axis=-1)))
    gt_xy = camera.project_points(jnp.asarray(pc[None]),
                                  jnp.asarray(rec.trans_mat[None]),
                                  img_w=cfg.img_w, img_h=cfg.img_h)
    pred_xy = camera.project_points(jnp.asarray(pc[None]),
                                    jnp.asarray(pred_trans[None]),
                                    img_w=cfg.img_w, img_h=cfg.img_h)
    rot2d = float(np.mean(np.linalg.norm(
        np.asarray(pred_xy) - np.asarray(gt_xy), axis=-1)))
    print(f"[cam-est] posenet camera error: rot3d_dist={rot3d:.4f} "
          f"rot2d_dist={rot2d:.2f}px (137px frame)")

    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    t0 = time.perf_counter()
    pv, pf = pipeline.image_to_mesh(params, img[None], pred_trans, cfg,
                                    sdf_params=SDFP)
    print(f"[cam-est] pred mesh: {len(pv)} verts {len(pf)} tris "
          f"({time.perf_counter() - t0:.2f}s incl compile)")
    score_vs_analytic(pv, pf, "cam-est")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "gt-cam"):
        run_gt_cam()
    if which in ("both", "cam-est"):
        run_cam_est()


if __name__ == "__main__":
    main()
