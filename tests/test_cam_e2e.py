"""Camera-estimation pipeline end-to-end: train-cam -> --mode create
(estimated-camera h5 tree) -> create-sdf --cam-est, plus the shift
augmentation and cam-shift training path."""
import os

import numpy as np
import pytest

from disn_tpu import cli
from disn_tpu.core import codecs
from disn_tpu.data import synthetic
from disn_tpu.data.pipeline import SdfImageDataset


SET = ["num_classes=32", "width_mult=0.125", "batch_size=2",
       "num_sample_points=64", "cat_limit=64", "view_num=2", "sdf_res=8",
       "learning_rate=1e-3", "alpha=true"]


def _set(extra=()):
    return [x for kv in (SET + list(extra)) for x in ("--set", kv)]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cam_e2e")
    synthetic.build_dataset(str(d / "data"), views=2, num_samples=512,
                            grid_res=8)
    return d


def test_random_shift():
    rng = np.random.RandomState(0)
    raw = np.zeros((64, 64, 4), np.uint8)
    raw[20:40, 25:45] = 200  # object block with margins
    shifted, target = SdfImageDataset.random_shift(raw, rng)
    assert shifted.shape == raw.shape
    assert shifted[..., 3].sum() == raw[..., 3].sum()  # pixels conserved
    dx, dy = target * 64 / 2.0
    ys, xs = np.nonzero(shifted[..., 3])
    assert ys.min() == pytest.approx(20 + dy, abs=0.5)
    assert xs.min() == pytest.approx(25 + dx, abs=0.5)


def test_cam_train_create_and_reconstruct(workdir):
    data = str(workdir / "data")
    run = str(workdir / "cam_run")

    # 1. train the pose net briefly (with the shift head active)
    cli.main(["train-cam", "--data-root", data, "--log-dir", run,
              "--epochs", "2", "--workers", "2", "--log-every", "1"]
             + _set(["cam_shift=true"]))
    ckpt = os.path.join(run, "latest.npz")
    if not os.path.exists(ckpt):  # <1000 steps: save cadence not reached
        from disn_tpu.train import checkpoint as ckpt_mod
        import jax
        from disn_tpu.config import Config
        from disn_tpu.models import posenet
        cfg = cli.apply_overrides(Config(), SET)
        params = posenet.init(cfg, jax.random.PRNGKey(0))
        ckpt_mod.save(ckpt, {"params": jax.tree_util.tree_map(
            np.asarray, params)})

    # 2. regenerate the view-h5 tree with predicted cameras
    cli.main(["train-cam", "--data-root", data, "--log-dir", run,
              "--mode", "create", "--split", "test", "--restore", ckpt]
             + _set())
    est = os.path.join(data, "renders_camest", "99999999", "sphere0",
                       "00.h5")
    assert os.path.exists(est)
    rec_est = codecs.read_view_h5(est)
    rec_gt = codecs.read_view_h5(os.path.join(
        data, "renders", "99999999", "sphere0", "00.h5"))
    assert rec_est.trans_mat.shape == (4, 3)
    assert not np.allclose(rec_est.trans_mat, rec_gt.trans_mat)
    np.testing.assert_array_equal(rec_est.img_arr, rec_gt.img_arr)

    # 3. eval mode reports the reference eval_one_epoch quantities (full
    # loss graph over split batches incl. avg/max/min rot2d/rot3d dists —
    # cam_est/train_sdf_cam.py:560-565), not probe-grid smoke metrics
    cli.main(["train-cam", "--data-root", data, "--log-dir", run,
              "--mode", "test", "--split", "test", "--restore", ckpt]
             + _set())
    log_txt = ""
    for name in os.listdir(run):
        if name.startswith("log_") and name.endswith(".txt"):
            with open(os.path.join(run, name)) as f:
                log_txt += f.read()
    assert "avg 3d dist" in log_txt and "avg 2d dist" in log_txt
    assert "cam eval rot2d_dist" in log_txt

    # 4. reconstruct with estimated cameras
    from disn_tpu.config import Config
    import jax
    from disn_tpu.models import disn
    from disn_tpu.train import checkpoint as ckpt_mod
    cfg = cli.apply_overrides(Config(), SET)
    sdf_params = disn.init(cfg, jax.random.PRNGKey(1))
    sdf_ckpt = str(workdir / "sdf.npz")
    ckpt_mod.save(sdf_ckpt, {"params": jax.tree_util.tree_map(
        np.asarray, sdf_params)})
    cli.main(["create-sdf", "--data-root", data, "--log-dir", run,
              "--restore", sdf_ckpt, "--cam-est", "--dense",
              "--split", "test"] + _set())
    out = os.path.join(run, "test_objs", "camest_9_0.0", "99999999")
    assert len(os.listdir(out)) == 6
