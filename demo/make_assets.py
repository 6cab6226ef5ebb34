"""Regenerate the bundled demo checkpoints.

Currently produces demo/tiny_posenet.npz: a posenet (reference
models/posenet.py heads over the VGG encoder) trained briefly on the
analytic-SDF synthetic dataset so `demo --cam-est` runs out of the box
with no GT matrix — the reference demo's two-graph contract
(demo/demo.py:195-258). Width-0.25 / 128-class to match
demo/tiny_synth.npz; weights stored f16 like the bundled SDF net.

Run from the repo root (CPU is fine, ~2-4 min):
    python demo/make_assets.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from disn_tpu import cli
    from disn_tpu.config import Config
    from disn_tpu.data import pipeline, synthetic
    from disn_tpu.models import posenet
    from disn_tpu.train import checkpoint
    from disn_tpu.train.trainer import create_state, make_cam_train_step

    cfg = cli.apply_overrides(
        Config(), ["width_mult=0.25", "num_classes=128", "batch_size=4",
                   "num_sample_points=256", "cat_limit=256", "view_num=8",
                   "learning_rate=1e-4"])
    root = tempfile.mkdtemp(prefix="posenet_ds_")
    synthetic.build_dataset(root, views=8)
    listinfo, cats_limit, paths = cli.data_handles(cfg, root, "train")
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=40, workers=2, seed=0)
    state = create_state(cfg, jax.random.PRNGKey(0), init_fn=posenet.init)
    step_fn = make_cam_train_step(cfg)
    loader.start()
    losses = {}
    for i, batch in enumerate(loader):
        cam_batch = {"img": batch["img"][..., :3],
                     "sample_pc": batch["sdf_pt"],
                     "RT": batch["regress_mat"],
                     "trans_mat": batch["trans_mat"]}
        state, losses = step_fn(state, cam_batch)
        if i % 20 == 0:
            print(f"step {i}: rot3d_dist={float(losses['rot3d_dist']):.4f} "
                  f"rot2d_dist={float(losses['rot2d_dist']):.4f}")
    loader.shutdown()
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a).astype(np.float16), state.params)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tiny_posenet.npz")
    checkpoint.save(out, {"params": params})
    print(f"wrote {out} (final rot3d_dist="
          f"{float(losses['rot3d_dist']):.4f})")


if __name__ == "__main__":
    main()
