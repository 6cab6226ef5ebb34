"""Multi-view fusion and alternate-encoder tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.infer import multiview
from disn_tpu.models import disn, encoders


def tiny_cfg(**kw):
    base = dict(num_classes=32, width_mult=0.125, sdf_res=8,
                sampling="native")
    base.update(kw)
    return Config(**base)


def test_multiview_single_view_matches_dense():
    """Fusing ONE view must equal the single-view dense path exactly."""
    from disn_tpu.infer import dense
    cfg = tiny_cfg()
    params = disn.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = rng.rand(1, 137, 137, 3).astype(np.float32)
    trans = np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]]).astype(np.float32)
    sp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    single = dense.dense_sdf(params, img, trans, sp, cfg, block=128)
    fused = multiview.multiview_sdf(params, img, trans[None], sp, cfg,
                                    block=128)
    np.testing.assert_allclose(fused, single, rtol=1e-4, atol=1e-5)


def test_multiview_fuses_views():
    cfg = tiny_cfg()
    params = disn.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 137, 137, 3).astype(np.float32)
    trans = np.stack([np.vstack([np.eye(3) * (50 + 10 * i),
                                 [68.0, 68.0, 2.0]]) for i in range(3)]
                     ).astype(np.float32)
    sp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    vol = multiview.multiview_sdf(params, imgs, trans, sp, cfg, block=128)
    assert vol.shape == (9, 9, 9)
    assert np.isfinite(vol).all()
    # fused result differs from any single view (distinct images)
    from disn_tpu.infer import dense
    v0 = dense.dense_sdf(params, imgs[:1], trans[0], sp, cfg, block=128)
    assert np.abs(vol - v0).max() > 1e-6


def test_alexnet_forward():
    params = encoders.init_alexnet(jax.random.PRNGKey(0), num_classes=16,
                                   width_mult=0.125)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 227, 227, 3))
    emb, eps = encoders.apply_alexnet(params, img)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()
    assert "conv5" in eps


def test_resnet_forward():
    params = encoders.init_resnet(jax.random.PRNGKey(0), num_classes=16,
                                  width_mult=0.125)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    emb, eps = encoders.apply_resnet(params, img)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()
    assert len(eps) == 4


def test_encoder_selection_forward():
    """EncoderKind.ALEXNET / RESNET are config-selectable through disn.init
    and drive the full twostream forward (local features concat from their
    own endpoint stacks; reference ships them unused,
    models/CNN/alexnet.py:25-211, models/CNN/resnet.py:1-46)."""
    import jax
    import numpy as np
    from disn_tpu.config import Config, EncoderKind
    from disn_tpu.models import disn

    for kind in (EncoderKind.ALEXNET, EncoderKind.RESNET):
        cfg = Config(encoder=kind, num_classes=32, width_mult=0.125,
                     num_sample_points=16, batch_size=1)
        params = disn.init(cfg, jax.random.PRNGKey(0))
        assert disn.ENCODER_SCOPE[kind] in params
        batch = {
            "img": np.random.RandomState(0).rand(1, 137, 137, 3)
            .astype(np.float32),
            "sample_pc": np.zeros((1, 16, 3), np.float32),
            "trans_mat": np.vstack([np.eye(3) * 60, [68, 68, 2]])
            .astype(np.float32)[None],
        }
        eps = disn.apply(params, batch, cfg)
        assert eps["pred_sdf"].shape == (1, 16, 1)
        assert eps["point_img_feat"].shape[-1] == cfg.local_feat_dim
        assert np.isfinite(np.asarray(eps["pred_sdf"])).all()


def test_alexnet_npy_loader(tmp_path):
    """BVLC npy layout (dict of [W, b], grouped convs) loads into the tree
    with block-diagonal expansion; mismatched layers (fc8/ImageNet) skip."""
    import jax
    import numpy as np
    from disn_tpu.models import encoders

    cfg_width = 0.125
    params = encoders.init_alexnet(jax.random.PRNGKey(0), num_classes=32,
                                   width_mult=cfg_width)
    rng = np.random.RandomState(0)
    data = {}
    for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        w = np.asarray(params[name]["weights"])
        g = encoders._ALEX_GROUPS.get(name, 1)
        k, _, cin, cout = w.shape
        wg = rng.randn(k, k, cin // g, cout).astype(np.float32)
        data[name] = [wg, rng.randn(cout).astype(np.float32)]
    data["fc8"] = [rng.randn(5, 1000).astype(np.float32),
                   rng.randn(1000).astype(np.float32)]  # mismatched: skipped
    p = tmp_path / "bvlc_tiny.npy"
    np.save(p, np.asarray(data, dtype=object), allow_pickle=True)

    loaded = encoders.load_alexnet_npy(str(p), params)
    w2 = np.asarray(loaded["conv2"]["weights"])
    k, _, cin, cout = w2.shape
    cpg, opg = cin // 2, cout // 2
    # block-diagonal: group blocks match the npy, off-diagonal zero
    np.testing.assert_array_equal(w2[:, :, :cpg, :opg],
                                  data["conv2"][0][..., :opg])
    np.testing.assert_array_equal(w2[:, :, cpg:, opg:],
                                  data["conv2"][0][..., opg:])
    assert (w2[:, :, :cpg, opg:] == 0).all()
    assert (w2[:, :, cpg:, :opg] == 0).all()
    # block-diag dense conv == per-group conv (the reference's split apply)
    import jax.numpy as jnp
    x = rng.randn(1, 9, 9, cin).astype(np.float32)
    dense = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w2), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    parts = [jax.lax.conv_general_dilated(
        jnp.asarray(x[..., i * cpg:(i + 1) * cpg]),
        jnp.asarray(data["conv2"][0][..., i * opg:(i + 1) * opg]), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for i in range(2)]
    np.testing.assert_allclose(np.asarray(dense),
                               np.asarray(jnp.concatenate(parts, -1)),
                               rtol=1e-5, atol=1e-4)
    # fc8 mismatched -> untouched
    np.testing.assert_array_equal(np.asarray(loaded["fc8"]["weights"]),
                                  np.asarray(params["fc8"]["weights"]))


def test_multiview_folded_matches_general():
    """tf1 sampling folds each view's endpoint pyramid + the local fold2
    matmul into one per-view 137-space map and averages the SAMPLES
    (linearity of the fold + the mean, infer/multiview._mv_prep); the
    result must match the general per-view concat path up to float
    summation order."""
    from disn_tpu.core import grids
    from disn_tpu.infer.dense import scale_pred

    cfg = tiny_cfg(sampling="tf1")
    assert multiview._use_fold(cfg)
    params = disn.init(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 137, 137, 3).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [np.vstack([np.eye(3) * (50 + 10 * i), [68.0, 68.0, 2.0]])
         for i in range(2)]).astype(np.float32))
    sp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    pts = grids.grid_block(jnp.asarray(sp), cfg.grid_resolution, 0, 128)

    state = multiview._mv_prep(params, imgs, cfg)
    assert state[1] is not None  # folded
    folded = multiview._mv_decode(params, state, trans, pts, cfg)

    embeddings, endpoints = disn.encode(params, imgs, cfg)
    local = multiview.fused_point_features(endpoints, pts, trans, cfg)
    pred = disn.decode_from_features(
        params, pts[None], jnp.mean(embeddings, 0, keepdims=True),
        local[None], cfg)
    if cfg.tanh:
        pred = jnp.tanh(pred)
    general = scale_pred(pred, cfg)[0]
    np.testing.assert_allclose(np.asarray(folded), np.asarray(general),
                               rtol=1e-4, atol=1e-5)


def test_multiview_sparse_matches_dense_mesh():
    """The two-level sparse multiview volume must produce the SAME mesh as
    the dense streamer (exact values inside the active band; coarse lerp
    only where no crossing can exist), on a trained-shaped analytic field
    so the band engages like production."""
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    cfg = tiny_cfg(sdf_res=32, num_classes=64)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, size=(3, 137, 137, 3), dtype=np.uint8)
    trans = np.stack([np.vstack([np.eye(3) * (50 + 10 * i),
                                 [68.0, 68.0, 2.0]]) for i in range(3)]
                     ).astype(np.float32)
    sp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    dense_vol = multiview.multiview_sdf(params, imgs, trans, sp, cfg)
    sparse_vol = multiview.multiview_sdf_sparse(params, imgs, trans, sp,
                                                cfg)
    assert sparse_vol is not None
    dv, df = pipeline.volume_to_mesh(dense_vol, sp, iso=cfg.iso)
    sv, sf = pipeline.volume_to_mesh(sparse_vol, sp, iso=cfg.iso)
    assert len(df) > 100
    np.testing.assert_array_equal(sf, df)
    np.testing.assert_allclose(sv, dv, atol=1e-6)
