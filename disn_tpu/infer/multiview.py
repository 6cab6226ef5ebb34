"""Multi-view fused reconstruction (reference --multi_view path:
placeholder_features + get_decoder, models/model_normalization.py:38-45,
84-90, 223-238).

Each of V views is encoded once; per query point, the global embedding and
the per-view local features (sampled through each view's own trans_mat) are
AVERAGED in feature space, then decoded by the same two MLP streams
(disn.decode_from_features). Views vectorize with vmap — the TPU-native
replacement for the reference's per-view feed_dict loop.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from disn_tpu.config import Config, Variant
from disn_tpu.core import camera, grids
from disn_tpu.models import disn, vgg
from disn_tpu.ops import image as image_ops

Params = dict[str, Any]


def encode_views(params: Params, imgs: jnp.ndarray, cfg: Config):
    """imgs [V,H,W,C] -> (embeddings [V,G], endpoints dict of [V,h,w,c])."""
    return disn.encode(params, imgs, cfg)


def fused_point_features(endpoints: dict[str, jnp.ndarray],
                         pts: jnp.ndarray, trans_mats: jnp.ndarray,
                         cfg: Config) -> jnp.ndarray:
    """Per-point local features averaged over views: [N, local_dim].

    pts [N,3]; trans_mats [V,4,3]; endpoints carry a leading view axis."""
    from disn_tpu.models import disn as _disn
    names = _disn.endpoint_names(cfg)

    def one_view(view_endpoints, trans_mat):
        px = camera.project_points(pts[None], trans_mat[None],
                                   img_w=cfg.img_w, img_h=cfg.img_h)
        sample = (image_ops.sample_native if cfg.sampling == "native"
                  else image_ops.resize_then_sample)
        return jnp.concatenate(
            [sample(view_endpoints[n], px, cfg.img_h, cfg.img_w)
             for n in names], axis=-1)[0]

    per_view_eps = {n: endpoints[n][:, None] for n in names}  # [V,1,h,w,c]
    feats = jax.vmap(one_view)(per_view_eps, trans_mats)      # [V,N,L]
    return jnp.mean(feats, axis=0)


def multiview_sdf(params: Params, imgs: np.ndarray, trans_mats: np.ndarray,
                  sdf_params: np.ndarray, cfg: Config,
                  block: int = 32768) -> np.ndarray:
    """V views -> fused [R,R,R] SDF volume (dense streaming)."""
    resolution = cfg.grid_resolution
    total = resolution ** 3
    padded = -(-total // block) * block

    @jax.jit
    def fn(params, imgs, trans_mats, sdf_params):
        embeddings, endpoints = encode_views(params, imgs, cfg)
        fused_embedding = jnp.mean(embeddings, axis=0, keepdims=True)

        def one(i):
            pts = grids.grid_block(sdf_params, resolution, i * block, block)
            local = fused_point_features(endpoints, pts, trans_mats, cfg)
            pred = disn.decode_from_features(
                params, pts[None], fused_embedding, local[None], cfg)
            if cfg.tanh:
                pred = jnp.tanh(pred)
            from disn_tpu.infer.dense import scale_pred
            return scale_pred(pred, cfg)[0]

        vals = jax.lax.map(one, jnp.arange(padded // block, dtype=jnp.int32))
        return vals.reshape(padded)[:total].reshape(
            resolution, resolution, resolution)

    return np.asarray(fn(params, jnp.asarray(imgs), jnp.asarray(trans_mats),
                         jnp.asarray(sdf_params)))
