"""Trainer tests: schedules, loss decrease on the synthetic fixture, sharded
data-parallel equivalence, checkpoint round-trip, and subset merge."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.data import listing, pipeline, synthetic
from disn_tpu.models import disn, posenet
from disn_tpu.parallel import make_mesh, batch_sharding, shard_batch
from disn_tpu.train import (TrainState, checkpoint, create_state,
                            lr_schedule, make_cam_train_step, make_train_step)
from disn_tpu.train.trainer import make_eval_step


def tiny_cfg(**kw):
    base = dict(batch_size=4, num_sample_points=64, num_classes=32,
                width_mult=0.125, learning_rate=1e-3, regularization=False)
    base.update(kw)
    return Config(**base)


def tiny_batch(cfg, key=0, size=None):
    rng = np.random.RandomState(key)
    b = size or cfg.batch_size
    n = cfg.num_sample_points
    pts = rng.uniform(-0.8, 0.8, (b, n, 3)).astype(np.float32)
    trans = np.stack([np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]])
                      .astype(np.float32)] * b)
    return {
        "img": rng.rand(b, 137, 137, 3).astype(np.float32),
        "sdf_pt": pts,
        "sdf_pt_rot": pts,
        "sdf_val": (np.linalg.norm(pts, axis=-1, keepdims=True) - 0.5
                    ).astype(np.float32),
        "trans_mat": trans,
    }


def test_lr_schedule_staircase():
    cfg = Config(learning_rate=1e-4, batch_size=20, lr_decay_step=200_000,
                 lr_decay_rate=0.9, lr_floor=1e-6)
    sched = lr_schedule(cfg)
    assert float(sched(jnp.int32(0))) == pytest.approx(1e-4)
    assert float(sched(jnp.int32(9_999))) == pytest.approx(1e-4)
    assert float(sched(jnp.int32(10_000))) == pytest.approx(9e-5)
    assert float(sched(jnp.int32(20_000))) == pytest.approx(8.1e-5)
    assert float(sched(jnp.int32(100_000_000))) == pytest.approx(1e-6)


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, tiny_batch(cfg))
    losses0 = None
    for i in range(8):
        state, losses = step(state, batch)
        if losses0 is None:
            losses0 = losses
    assert float(losses["sdf_loss"]) < float(losses0["sdf_loss"])
    assert int(state.step) == 8
    assert np.isfinite(float(losses["overall_loss"]))


def test_train_step_sharded_matches_single():
    """DP over an 8-device mesh must produce the same update as 1 device."""
    cfg = tiny_cfg(batch_size=8)
    state = create_state(cfg, jax.random.PRNGKey(1))
    batch = tiny_batch(cfg)
    step = make_train_step(cfg, donate=False)

    s_single, l_single = step(state, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    assert sharded["img"].sharding.is_equivalent_to(
        batch_sharding(mesh, 4), ndim=4)
    s_shard, l_shard = step(state, sharded)

    np.testing.assert_allclose(float(l_single["sdf_loss"]),
                               float(l_shard["sdf_loss"]), rtol=2e-5)
    a = jax.tree_util.tree_leaves(s_single.params)[0]
    b = jax.tree_util.tree_leaves(s_shard.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_eval_step():
    cfg = tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    ev = make_eval_step(cfg)
    losses = ev(state.params, jax.tree_util.tree_map(jnp.asarray,
                                                     tiny_batch(cfg)))
    assert 0.0 <= float(losses["accuracy"]) <= 1.0


def test_cam_train_step():
    cfg = tiny_cfg(cam_loss_mode="3DM")
    state = create_state(cfg, jax.random.PRNGKey(2), init_fn=posenet.init)
    step = make_cam_train_step(cfg, donate=False)
    rng = np.random.RandomState(0)
    b, n = cfg.batch_size, 32
    batch = {
        "img": jnp.asarray(rng.rand(b, 137, 137, 3), jnp.float32),
        "sample_pc": jnp.asarray(rng.uniform(-1, 1, (b, n, 3)), jnp.float32),
        "RT": jnp.asarray(rng.randn(b, 4, 3), jnp.float32),
        "trans_mat": jnp.asarray(rng.randn(b, 4, 3) * 10, jnp.float32),
    }
    l0 = None
    for _ in range(5):
        state, losses = step(state, batch)
        if l0 is None:
            l0 = losses
    assert float(losses["overall_loss"]) < float(l0["overall_loss"])


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(3))
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, tree, metadata={"epoch": 7})
    assert checkpoint.load_metadata(path)["epoch"] == 7
    restored = checkpoint.restore(path, tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_params_and_merge(tmp_path):
    cfg = tiny_cfg()
    p1 = disn.init(cfg, jax.random.PRNGKey(0))
    p2 = disn.init(cfg, jax.random.PRNGKey(9))
    path = str(tmp_path / "donor.npz")
    checkpoint.save(path, p2)
    donor = checkpoint.restore_params(path)

    merged, skipped = checkpoint.merge_scopes(p1, donor, scopes=("vgg_16",))
    # vgg scope comes from donor, sdf scopes untouched
    np.testing.assert_array_equal(
        np.asarray(merged["vgg_16"]["conv1"]["conv1_1"]["weights"]),
        np.asarray(p2["vgg_16"]["conv1"]["conv1_1"]["weights"]))
    np.testing.assert_array_equal(
        np.asarray(merged["sdfprediction"]["fold1"]["conv1"]["weights"]),
        np.asarray(p1["sdfprediction"]["fold1"]["conv1"]["weights"]))

    # shape-mismatch skipping (the reference skips fc8/logits when widths differ)
    donor2 = jax.tree_util.tree_map(lambda x: x, donor)
    donor2["vgg_16"]["fc8"]["weights"] = np.zeros((1, 1, 4096, 99), np.float32)
    merged2, skipped2 = checkpoint.merge_scopes(p1, donor2, scopes=("vgg_16",))
    assert any("fc8" in s for s in skipped2)
    np.testing.assert_array_equal(
        np.asarray(merged2["vgg_16"]["fc8"]["weights"]),
        np.asarray(p1["vgg_16"]["fc8"]["weights"]))

    # skip_substr mirrors --restore_modelcnn's logits exclusion
    _, skipped3 = checkpoint.merge_scopes(p1, donor, skip_substr=("fc8",))
    assert any("fc8" in s for s in skipped3)


def test_checkpoint_manager(tmp_path):
    mgr = checkpoint.CheckpointManager(str(tmp_path), period=2)
    tree = {"w": np.arange(4, dtype=np.float32)}
    mgr.save_latest(tree, step=5)
    mgr.save_epoch(tree, epoch=2, metric=0.5)
    mgr.save_epoch({"w": np.ones(4, np.float32)}, epoch=3, metric=0.9)
    assert mgr.latest_path() and mgr.best_path()
    best = checkpoint.restore_params(mgr.best_path())
    np.testing.assert_array_equal(best["w"], np.ones(4, np.float32))
    assert (tmp_path / "epoch_002.npz").exists()
    assert not (tmp_path / "epoch_003.npz").exists()


def test_end_to_end_fixture_training(tmp_path):
    """Full pipeline: synthetic dataset -> loader -> sharded train steps."""
    info = synthetic.build_dataset(str(tmp_path / "ds"), views=2,
                                   num_samples=1024, grid_res=8)
    cfg = synthetic.tiny_config(num_sample_points=64, batch_size=2,
                                num_classes=32, width_mult=0.125,
                                regularization=True)
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=2)
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    mesh = make_mesh(data=2, points=4)
    loader = pipeline.make_loader(
        cfg, paths, listinfo, cats_limit, epochs=2, workers=2,
        sharding=batch_sharding(mesh, 1), seed=0)
    loader.start()
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    losses = []
    for batch in loader:
        state, l = step(state, batch)
        losses.append(float(l["sdf_loss"]))
    assert len(losses) == len(loader)
    assert np.isfinite(losses).all()
    loader.shutdown()


def test_profiler_trace_and_timer(tmp_path):
    """utils.logging: jax profiler trace context writes a trace; Timer EMA."""
    from disn_tpu.utils import Timer
    from disn_tpu.utils.logging import trace
    import glob as g
    import jax.numpy as jnp

    with trace(str(tmp_path / "tr")):
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    assert g.glob(str(tmp_path / "tr" / "**" / "*.xplane.pb"),
                  recursive=True)
    # no-op when dir is None
    with trace(None):
        pass
    t = Timer()
    with t.phase("x"):
        pass
    assert "x" in t.summary()
