"""Model-stack tests: VGG endpoints, decoder-head oracles, full DISN variants,
posenet heads, and loss formulas against hand-computed numpy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disn_tpu.config import Config, Variant
from disn_tpu.models import disn, layers, posenet, sdfnet, vgg


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_vgg_shapes_and_endpoints(rng):
    params = vgg.init(rng, in_channels=3, num_classes=1024)
    img = jax.random.uniform(rng, (1, 224, 224, 3))
    emb, eps = vgg.apply(params, img)
    assert emb.shape == (1, 1024)
    assert eps["conv1_2"].shape == (1, 224, 224, 64)
    assert eps["conv2_2"].shape == (1, 112, 112, 128)
    assert eps["conv3_3"].shape == (1, 56, 56, 256)
    assert eps["conv4_3"].shape == (1, 28, 28, 512)
    assert eps["conv5_3"].shape == (1, 14, 14, 512)
    # VGG-16 with 1024-dim fc8: known parameter count
    n = layers.param_count(params)
    # convs: standard vgg16 conv params 14,714,688; fc6 7*7*512*4096+4096;
    # fc7 4096*4096+4096; fc8 4096*1024+1024
    expect = 14_714_688 + (7 * 7 * 512 * 4096 + 4096) + (4096 * 4096 + 4096) \
        + (4096 * 1024 + 1024)
    assert n == expect


def test_global_head_matches_numpy_oracle(rng):
    p = sdfnet.init_global_head(rng, global_dim=8)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    got = np.asarray(sdfnet.apply_global_head(p, pts, g))

    def relu(x):
        return np.maximum(x, 0)

    pn, gn = np.asarray(pts), np.asarray(g)
    w = jax.tree_util.tree_map(np.asarray, p)
    h = relu(pn @ w["fold1"]["conv1"]["weights"] + w["fold1"]["conv1"]["biases"])
    h = relu(h @ w["fold1"]["conv2"]["weights"] + w["fold1"]["conv2"]["biases"])
    h = relu(h @ w["fold1"]["conv3"]["weights"] + w["fold1"]["conv3"]["biases"])
    h = np.concatenate([h, np.broadcast_to(gn[:, None], (2, 5, 8))], axis=-1)
    h = relu(h @ w["fold2"]["conv1"]["weights"] + w["fold2"]["conv1"]["biases"])
    h = relu(h @ w["fold2"]["conv2"]["weights"] + w["fold2"]["conv2"]["biases"])
    want = h @ w["fold2"]["conv5"]["weights"] + w["fold2"]["conv5"]["biases"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _tiny_cfg(**kw):
    return Config(**kw)


def _fake_batch(cfg, n=16, key=3):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 4)
    return {
        "img": jax.random.uniform(ks[0], (1, 137, 137, cfg.img_channels)),
        "sample_pc": jax.random.normal(ks[1], (1, n, 3)) * 0.4,
        "sample_pc_rot": jax.random.normal(ks[1], (1, n, 3)) * 0.4,
        "trans_mat": jax.random.normal(ks[2], (1, 4, 3))
        + jnp.asarray([[0.0, 0, 0], [0, 0, 0], [0, 0, 0], [60, 60, 2.0]]),
        "sdf": jax.random.normal(ks[3], (1, n, 1)) * 0.05,
    }


@pytest.mark.parametrize("variant,binary", [
    (Variant.TWOSTREAM, False),   # full width: pins the 1472-dim contract
    (Variant.TWOSTREAM, True),
    (Variant.ONESTREAM, False),
    (Variant.GLOBAL, False),
])
def test_disn_variants_forward(rng, variant, binary):
    # only the first case runs full width (CPU compile cost); the rest only
    # check routing/shapes, which width_mult preserves
    full = variant is Variant.TWOSTREAM and not binary
    cfg = _tiny_cfg(variant=variant, binary=binary,
                    **({} if full else dict(width_mult=0.25,
                                            num_classes=256)))
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    eps = disn.apply(params, batch, cfg)
    out_dim = 2 if binary else 1
    assert eps["pred_sdf"].shape == (1, 16, out_dim)
    assert np.isfinite(np.asarray(eps["pred_sdf"])).all()
    if variant is Variant.TWOSTREAM:
        assert eps["point_img_feat"].shape == (1, 16, cfg.local_feat_dim)
    if full:
        assert cfg.local_feat_dim == 1472
        np.testing.assert_allclose(
            np.asarray(eps["pred_sdf"]),
            np.asarray(eps["pred_sdf_value_global"]
                       + eps["pred_sdf_value_local"]), rtol=1e-5)


def test_disn_threedcnn_forward(rng):
    cfg = _tiny_cfg(variant=Variant.THREEDCNN)
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    eps = disn.apply(params, batch, cfg)
    assert eps["pred_sdf"].shape == (1, 65 ** 3, 1)


def test_fused_vs_materializing_sampling(rng):
    cfg = _tiny_cfg(width_mult=0.25, num_classes=256)
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    a = disn.apply(params, batch, cfg, fused_sampling=True)["pred_sdf"]
    b = disn.apply(params, batch, cfg, fused_sampling=False)["pred_sdf"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_tanh_squash(rng):
    cfg = _tiny_cfg(variant=Variant.GLOBAL, tanh=True)
    params = disn.init(cfg, rng)
    eps = disn.apply(params, _fake_batch(cfg), cfg)
    assert np.abs(np.asarray(eps["pred_sdf"])).max() <= 1.0


def test_loss_regression_formula(rng):
    cfg = _tiny_cfg(variant=Variant.GLOBAL, regularization=False)
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    eps = disn.apply(params, batch, cfg)
    loss, losses = disn.get_loss(eps, batch["sdf"], params, cfg)

    pred = np.asarray(eps["pred_sdf"])
    gt = np.asarray(batch["sdf"])
    mask = np.where(gt <= 0.01, 4.0, 1.0)
    want = np.mean(np.abs(gt * 10.0 - pred) * mask) * 1000.0
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    acc = np.mean((gt > 0) == (pred > 0))
    np.testing.assert_allclose(float(losses["accuracy"]), acc, rtol=1e-6)
    np.testing.assert_allclose(float(losses["sdf_loss_realvalue"]),
                               np.mean(np.abs(gt - pred / 10.0)), rtol=1e-5)


def test_loss_binary_formula(rng):
    cfg = _tiny_cfg(variant=Variant.GLOBAL, binary=True, regularization=False)
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    eps = disn.apply(params, batch, cfg)
    loss, losses = disn.get_loss(eps, batch["sdf"], params, cfg)
    pred = np.asarray(eps["pred_sdf"])
    gt = np.asarray(batch["sdf"])
    labels = (gt[..., 0] > 0).astype(np.int64)
    logits = pred - pred.max(axis=-1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    ce = -np.take_along_axis(logp, labels[..., None], axis=-1)
    np.testing.assert_allclose(float(loss), np.mean(ce) * 100.0, rtol=1e-5)


def test_regularization_term(rng):
    cfg = _tiny_cfg(variant=Variant.GLOBAL, width_mult=0.125,
                    num_classes=32)
    params = disn.init(cfg, rng)
    batch = _fake_batch(cfg)
    eps = disn.apply(params, batch, cfg)
    _, losses = disn.get_loss(eps, batch["sdf"], params, cfg)
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if path[-1].key == "weights":
            total += np.sum(np.square(np.asarray(leaf))) / 2.0
    np.testing.assert_allclose(float(losses["regularization"]),
                               cfg.weight_decay * total, rtol=1e-5)


def test_posenet_heads(rng):
    cfg = _tiny_cfg(cam_shift=True)
    heads = posenet.init_heads(rng, global_dim=16, shift=True)
    emb = jax.random.normal(jax.random.PRNGKey(5), (3, 16))
    out = posenet.apply_heads(heads, emb)
    assert out["pred_RT"].shape == (3, 4, 3)
    assert out["pred_xyshift"].shape == (3, 2)
    # rotation part is scale * orthonormal: R R^T = scale^2 I
    R = np.asarray(out["pred_rotation"])
    for i in range(3):
        rrt = R[i] @ R[i].T
        s2 = rrt[0, 0]
        np.testing.assert_allclose(rrt, np.eye(3) * s2, atol=1e-4)


def test_posenet_full_and_loss(rng):
    cfg = _tiny_cfg(cam_loss_mode="3DM", width_mult=0.125, num_classes=32)
    params = posenet.init(cfg, rng)
    img = jax.random.uniform(rng, (1, 137, 137, 3))
    eps = posenet.apply(params, img, cfg)
    assert eps["pred_trans_mat"].shape == (1, 4, 3)
    batch = {
        "sample_pc": jax.random.normal(rng, (1, 32, 3)) * 0.3,
        "RT": jax.random.normal(rng, (1, 4, 3)),
        "trans_mat": jax.random.normal(rng, (1, 4, 3))
        + jnp.asarray([[0.0, 0, 0], [0, 0, 0], [0, 0, 0], [60, 60, 2.0]]),
    }
    loss, losses = posenet.get_loss(eps, batch, params, cfg)
    assert np.isfinite(float(loss))
    want = float(losses["rotpc_loss"] + 0.3 * losses["rotmatrix_loss"]
                 + losses["regularization"])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_cam_2d_loss_unclamped_and_shifted(rng):
    """Reference parity (cam_est/model_cam.py): the 2D loss uses UNCLAMPED
    projections, and in shift mode the GT projection carries the GT shift —
    a perfect prediction must zero the 2D loss."""
    import numpy as np
    cfg = _tiny_cfg(cam_loss_mode="2D", cam_shift=True,
                    regularization=False)
    r = np.random.RandomState(0)
    trans = np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]]
                      ).astype(np.float32)[None]
    shifts = np.asarray([[0.3, -0.2]], np.float32)
    batch = {
        "sample_pc": jnp.asarray(r.uniform(-2, 2, (1, 64, 3)), jnp.float32),
        "RT": jnp.asarray(trans),
        "trans_mat": jnp.asarray(trans),
        "shifts": jnp.asarray(shifts),
    }
    # perfect prediction: same matrix, same shift
    end_points = {"pred_RT": jnp.asarray(trans),
                  "pred_trans_mat": jnp.asarray(trans),
                  "pred_xyshift": jnp.asarray(shifts)}
    loss, losses = posenet.get_loss(end_points, batch, {"vgg_16": {}}, cfg)
    assert float(losses["rot2d_loss"]) == pytest.approx(0.0, abs=1e-4)
    assert float(losses["shiftxy_loss"]) == pytest.approx(0.0, abs=1e-8)
    # wrong shift must show up in the 2D loss even for a perfect matrix
    end_points["pred_xyshift"] = jnp.asarray([[0.0, 0.0]], jnp.float32)
    _, losses2 = posenet.get_loss(end_points, batch, {"vgg_16": {}}, cfg)
    assert float(losses2["rot2d_loss"]) > 1.0


def test_batch_norm_and_dropout():
    """tf_util.py:513-607 parity wrappers (SURVEY §2 row 9): batch_norm
    normalizes batch moments in training (unit-moment output, EMA update
    with decay 0.9) and uses moving moments in inference; dropout is
    inverted (mean-preserving) and identity when not training."""
    import jax
    import jax.numpy as jnp

    from disn_tpu.models import layers

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(8, 5, 5, 3).astype(np.float32) * 2.0 + 1.0)
    p = layers.init_batch_norm(3)

    y, p2 = layers.batch_norm(p, x, is_training=True)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1.0,
                               atol=1e-2)
    want_mm = 0.1 * np.asarray(x, np.float32).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(p2["moving_mean"]), want_mm,
                               rtol=1e-5)

    # inference: moving moments, params untouched
    yi, p3 = layers.batch_norm(p2, x, is_training=False)
    assert p3 is p2
    mm, mv = p2["moving_mean"], p2["moving_variance"]
    want = (np.asarray(x) - np.asarray(mm)) / np.sqrt(
        np.asarray(mv) + 1e-3)
    np.testing.assert_allclose(np.asarray(yi), want, rtol=1e-4, atol=1e-5)

    key = jax.random.PRNGKey(0)
    d = layers.dropout(key, x, rate=0.5, is_training=True)
    zeros = np.mean(np.asarray(d) == 0.0)
    assert 0.3 < zeros < 0.7
    nz = np.asarray(d)[np.asarray(d) != 0]
    xs = np.asarray(x)[np.asarray(d) != 0]
    np.testing.assert_allclose(nz, xs * 2.0, rtol=1e-6)  # inverted scaling
    np.testing.assert_array_equal(
        np.asarray(layers.dropout(key, x, rate=0.5, is_training=False)),
        np.asarray(x))


def test_encode_uint8_matches_host_normalized(rng):
    """u8 images normalize on-device (disn.encode): in eager mode
    bit-identical to the host astype(f32)/255 they replace (under jit,
    XLA fusion may reassociate the /255 — ~1e-5-class drift) — the
    farm/bench ship u8 over the tunnel, 4x fewer upload bytes on the
    e2e critical path."""
    cfg = Config(num_classes=32, width_mult=0.125)
    params = {"vgg_16": vgg.init(rng, in_channels=3, num_classes=32,
                                 width_mult=0.125)}
    img_u8 = np.asarray(
        jax.random.randint(rng, (1, 137, 137, 3), 0, 256), np.uint8)
    emb_u8, eps_u8 = disn.encode(params, jnp.asarray(img_u8), cfg)
    emb_f, eps_f = disn.encode(
        params, jnp.asarray(img_u8.astype(np.float32) / 255.0), cfg)
    np.testing.assert_array_equal(np.asarray(emb_u8), np.asarray(emb_f))
    for n in eps_u8:
        np.testing.assert_array_equal(np.asarray(eps_u8[n]),
                                      np.asarray(eps_f[n]))


def test_apply_fold_matches_unfolded(rng):
    """apply(fold=True) — the trainer's folded-137 sampling — must match
    the reference-form graph in predictions AND gradients (the fold is
    pure linear-algebra reassociation; see disn.apply docstring)."""
    cfg = Config(num_classes=32, width_mult=0.125)
    params = disn.init(cfg, rng)
    rs = np.random.RandomState(0)
    B, N = 2, 64
    batch = {
        "img": jnp.asarray(rs.rand(B, 137, 137, 3), jnp.float32),
        "sample_pc": jnp.asarray(rs.uniform(-0.8, 0.8, (B, N, 3)),
                                 jnp.float32),
        "trans_mat": jnp.asarray(
            np.stack([np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]])] * B),
            jnp.float32),
    }
    gt = jnp.asarray(rs.randn(B, N, 1) * 0.05, jnp.float32)

    def loss(params, fold):
        ep = disn.apply(params, batch, cfg, fold=fold)
        return disn.get_loss(ep, gt, params, cfg)[0], ep["pred_sdf"]

    (l0, p0), g0 = jax.value_and_grad(loss, has_aux=True)(params, False)
    (l1, p1), g1 = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat1, flat0):
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-3)
