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
