"""End-to-end CLI test on the synthetic fixture: synth -> train ->
create-sdf -> evaluate -> demo. The minimum end-to-end slice (SURVEY.md §7.3)
without the 30GB dataset."""
import json
import os

import numpy as np
import pytest

from disn_tpu import cli
from disn_tpu.core import codecs


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


SET = ["num_classes=32", "width_mult=0.125", "batch_size=2",
       "num_sample_points=128", "cat_limit=64", "view_num=2", "sdf_res=16",
       "learning_rate=1e-3"]


def _set_args():
    return [x for kv in SET for x in ("--set", kv)]


def test_e2e(workdir):
    data = str(workdir / "data")
    run = str(workdir / "run")

    # 1. synthetic dataset
    cli.main(["synth", "--out-dir", data, "--views", "2",
              "--num-samples", "1024", "--grid-res", "16"])
    assert os.path.exists(os.path.join(data, "filelists",
                                       "99999999_train.lst"))

    # 2. ground-truth meshes for evaluation (from the analytic grids)
    from disn_tpu.ops import marching
    gt_dir = os.path.join(data, "gt_meshes")
    for obj in ("sphere0", "box0", "torus0"):
        df = codecs.read_dist(os.path.join(data, "sdf_grids", "99999999",
                                           obj, "grid.dist"))
        v, f = marching.extract_mesh(df.values, df.params)
        codecs.write_obj(os.path.join(gt_dir, "99999999", obj,
                                      "isosurf.obj"), v, f)

    # 3. train one epoch
    cli.main(["train", "--data-root", data, "--log-dir", run,
              "--epochs", "1", "--workers", "2", "--log-every", "1"]
             + _set_args())
    assert os.path.exists(os.path.join(run, "latest.npz"))
    assert os.path.exists(os.path.join(run, "best.npz"))
    assert os.path.exists(os.path.join(run, "log_train.txt"))
    lines = [json.loads(ln) for ln in
             open(os.path.join(run, "metrics_train.jsonl"))]
    assert lines and np.isfinite(lines[-1]["overall_loss"])

    # 4. reconstruct the test split (dense path on the tiny grid)
    cli.main(["create-sdf", "--data-root", data, "--log-dir", run,
              "--restore", os.path.join(run, "latest.npz"), "--dense",
              "--split", "test"] + _set_args())
    pred_dir = os.path.join(run, "test_objs", "17_0.0")
    objs = []
    for root, _, files in os.walk(pred_dir):
        objs += [os.path.join(root, f) for f in files if f.endswith(".obj")]
    assert len(objs) == 6  # 3 shapes x 2 views

    # 5a. evaluate protocol on a GT-copy prediction tree (deterministic)
    copy_dir = os.path.join(str(workdir), "pred_copy")
    for obj in ("sphere0", "box0", "torus0"):
        v, f = codecs.read_obj(os.path.join(gt_dir, "99999999", obj,
                                            "isosurf.obj"))
        for view in range(2):
            codecs.write_obj(os.path.join(
                copy_dir, "99999999", f"99999999_{obj}_{view:02d}.obj"), v, f)
    cli.main(["evaluate", "--data-root", data, "--pred-dir", copy_dir,
              "--gt-dir", gt_dir, "--view-num", "2", "--num-points", "256",
              "--dim", "32", "--metrics", "cd,emd,fscore,iou",
              "--out", os.path.join(run, "eval.json")])
    res = json.load(open(os.path.join(run, "eval.json")))
    cat = res["categories"]["99999999"]
    assert cat["objects"] == 3
    for key in ("cd_avg", "cd_min", "emd_avg", "iou_avg"):
        assert key in cat and np.isfinite(cat[key])
    assert cat["iou_avg"] == pytest.approx(1.0)  # identical meshes
    assert len(cat["f1"]) == 6

    # 5b. evaluate the net's own outputs — must run even when the barely-
    # trained net produces empty meshes for some objects; exercise the
    # device-IoU and surface-protocol flags on this pass
    cli.main(["evaluate", "--data-root", data, "--pred-dir", pred_dir,
              "--gt-dir", gt_dir, "--view-num", "2", "--num-points", "256",
              "--dim", "32", "--metrics", "cd,iou", "--device-iou",
              "--protocol", "surface",
              "--out", os.path.join(run, "eval_net.json")])
    assert os.path.exists(os.path.join(run, "eval_net.json"))

    # 6. demo from a view h5
    out_obj = os.path.join(run, "demo.obj")
    cli.main(["demo", "--image",
              os.path.join(data, "renders", "99999999", "sphere0", "00.h5"),
              "--restore", os.path.join(run, "latest.npz"),
              "--out", out_obj, "--dense"] + _set_args())
    assert os.path.exists(out_obj)


def test_config_overrides():
    from disn_tpu.config import Config, Variant
    cfg = cli.apply_overrides(
        Config(), ["variant=onestream", "binary=true", "sdf_res=128",
                   "learning_rate=0.01"])
    assert cfg.variant is Variant.ONESTREAM
    assert cfg.binary is True
    assert cfg.sdf_res == 128
    assert cfg.learning_rate == pytest.approx(0.01)
    with pytest.raises(SystemExit):
        cli.apply_overrides(Config(), ["nope=1"])


def test_train_resume(workdir):
    """Elastic resume: second run continues from latest.npz (step advances,
    optimizer state preserved)."""
    data = str(workdir / "data")
    if not os.path.exists(os.path.join(data, "filelists")):
        cli.main(["synth", "--out-dir", data, "--views", "2",
                  "--num-samples", "1024", "--grid-res", "16"])
    run = str(workdir / "resume_run")
    cli.main(["train", "--data-root", data, "--log-dir", run,
              "--epochs", "1", "--workers", "2", "--log-every", "1",
              "--dump-every", "0"] + _set_args())
    from disn_tpu.train import checkpoint
    step1 = checkpoint.load_metadata(os.path.join(run, "latest.npz"))["step"]
    assert step1 > 0
    cli.main(["train", "--data-root", data, "--log-dir", run,
              "--epochs", "1", "--workers", "2", "--log-every", "1",
              "--dump-every", "0", "--resume", run] + _set_args())
    step2 = checkpoint.load_metadata(os.path.join(run, "latest.npz"))["step"]
    assert step2 == 2 * step1


def test_multiview_and_demo_asset(workdir, tmp_path):
    """--multi-view reconstruction + the bundled demo asset path."""
    data = str(workdir / "data")
    if not os.path.exists(os.path.join(data, "filelists")):
        cli.main(["synth", "--out-dir", data, "--views", "2",
                  "--num-samples", "1024", "--grid-res", "16"])
    run = str(workdir / "mv_run")
    import jax
    from disn_tpu.config import Config
    from disn_tpu.models import disn
    from disn_tpu.train import checkpoint
    cfg = cli.apply_overrides(Config(), SET)
    params = disn.init(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "mv.npz")
    checkpoint.save(ckpt, {"params": jax.tree_util.tree_map(
        np.asarray, params)})
    cli.main(["create-sdf", "--data-root", data, "--log-dir", run,
              "--restore", ckpt, "--split", "test", "--multi-view"]
             + _set_args())
    out = os.path.join(run, "test_objs", "17_0.0_mv", "99999999")
    names = sorted(os.listdir(out))
    assert names == ["99999999_box0_fused.obj", "99999999_sphere0_fused.obj",
                     "99999999_torus0_fused.obj"]

    # bundled demo asset (repo-generated torus view)
    out_obj = str(tmp_path / "demo_torus.obj")
    cli.main(["demo", "--image", "demo/torus.h5", "--restore", ckpt,
              "--out", out_obj, "--dense"] + _set_args())
    assert os.path.exists(out_obj)


def test_convert_ckpt_cli(tmp_path):
    pytest.importorskip("tensorflow")
    import tensorflow.compat.v1 as tf1
    tf1.disable_eager_execution()
    prefix = str(tmp_path / "m.ckpt")
    g = tf1.Graph()
    with g.as_default():
        v = tf1.get_variable("sdfprediction/fold1/conv1/weights",
                             initializer=np.ones((1, 1, 3, 64), np.float32))
        saver = tf1.train.Saver([v])
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False,
                       write_state=False)
    out = str(tmp_path / "conv.npz")
    cli.main(["convert-ckpt", "--tf-prefix", prefix, "--out", out])
    from disn_tpu.train import checkpoint
    params = checkpoint.restore_params(out)["params"]
    assert params["sdfprediction"]["fold1"]["conv1"]["weights"].shape == (3, 64)


def test_demo_chair_png_with_trans_mat(tmp_path):
    """The reference demo contract wiring: bundled chair PNG
    (demo/03001627_17e916fc863540ee3def89b32cef8e45_20.png) + its
    hard-coded GT trans_mat (demo/demo.py:272-276, shipped as
    demo/chair_trans_mat.txt) through `demo --image <png> --trans-mat
    <txt>`. Geometry parity with demo/result.obj needs the converted
    SDF_DISN checkpoint (data-blocked); the input path and camera are the
    reference's exactly."""
    import jax
    from disn_tpu.config import Config
    from disn_tpu.models import disn
    from disn_tpu.train import checkpoint

    cfg = cli.apply_overrides(Config(), SET)
    params = disn.init(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "demo.npz")
    checkpoint.save(ckpt, {"params": jax.tree_util.tree_map(
        np.asarray, params)})
    out_obj = str(tmp_path / "chair.obj")
    cli.main(["demo", "--image", "demo/chair.png",
              "--trans-mat", "demo/chair_trans_mat.txt",
              "--restore", ckpt, "--out", out_obj, "--dense"] + _set_args())
    assert os.path.exists(out_obj)
    # the parsed matrix must be the reference's values
    m = np.loadtxt("demo/chair_trans_mat.txt", dtype=np.float32, comments="#")
    assert m.shape == (4, 3)
    np.testing.assert_allclose(m[3], [101.133705, 101.34268, 1.4305686])


def test_demo_cam_est_out_of_the_box(tmp_path):
    """Round-2 verdict item 7: `demo --cam-est` with NO GT matrix and NO
    --cam-restore uses the bundled synthetically-trained posenet
    (demo/tiny_posenet.npz, regenerable via demo/make_assets.py) — the
    reference demo's two-graph contract (demo/demo.py:195-258)."""
    out_obj = str(tmp_path / "torus_est.obj")
    cli.main(["demo", "--image", "demo/torus.png", "--cam-est",
              "--restore", "demo/tiny_synth.npz", "--out", out_obj,
              "--set", "width_mult=0.25", "--set", "num_classes=128",
              "--set", "sdf_res=32"])
    assert os.path.exists(out_obj)
    from disn_tpu.core import codecs
    verts, faces = codecs.read_obj(out_obj)
    assert len(faces) > 100 and np.isfinite(verts).all()
