"""Camera pose estimation net (re-imagining models/posenet.py +
cam_est/model_cam.py).

From the VGG global embedding, four MLP heads predict scale (64->32->1,
scaling an identity), rotation (512->256->6 ortho6d -> Gram-Schmidt matrix),
translation (128->64->3 plus a fixed dataset-statistics bias,
posenet.py:64-77), and optionally a 2-DoF pixel shift (128->64->2).
pred_RT = concat(scale*R, t) as a [B,4,3] right-multiply matrix;
pred_trans_mat = pred_RT @ K^T (model_cam.py:102-103).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.core import camera
from disn_tpu.models import layers, vgg

Params = dict[str, Any]


def init_heads(key: jax.Array, global_dim: int = 1024,
               shift: bool = False) -> Params:
    k = jax.random.split(key, 12)
    params: Params = {
        "scale": {
            "fc1": layers.init_dense(k[0], global_dim, 64),
            "fc2": layers.init_dense(k[1], 64, 32),
            "fc3": layers.init_dense(k[2], 32, 1),
        },
        "ortho6d": {
            "fc1": layers.init_dense(k[3], global_dim, 512),
            "fc2": layers.init_dense(k[4], 512, 256),
            "fc3": layers.init_dense(k[5], 256, 6),
        },
        "translation": {
            "fc1": layers.init_dense(k[6], global_dim, 128),
            "fc2": layers.init_dense(k[7], 128, 64),
            # reference initializes this head's kernel with truncated normal
            # stddev 0.05 (posenet.py:68-70)
            "fc3": layers.init_dense(k[8], 64, 3, stddev=0.05),
        },
    }
    if shift:
        params["xyshift"] = {
            "fc1": layers.init_dense(k[9], global_dim, 128),
            "fc2": layers.init_dense(k[10], 128, 64),
            "fc3": layers.init_dense(k[11], 64, 2),
        }
    return params


def init(cfg: Config, key: jax.Array) -> Params:
    k_vgg, k_heads = jax.random.split(key)
    return {
        "vgg_16": vgg.init(k_vgg, in_channels=3, num_classes=cfg.num_classes,
                           width_mult=cfg.width_mult),
        "cameraprediction": init_heads(k_heads, cfg.num_classes,
                                       shift=cfg.cam_shift),
    }


def _head(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = layers.dense(p["fc1"], x)
    h = layers.dense(p["fc2"], h)
    return layers.dense(p["fc3"], h, relu=False)


def apply_heads(params: Params, embedding: jnp.ndarray
                ) -> dict[str, jnp.ndarray]:
    """embedding [B,G] -> dict with pred_RT [B,4,3] (+ optional xyshift)."""
    b = embedding.shape[0]
    scale = _head(params["scale"], embedding).reshape(b, 1, 1)
    rot6d = _head(params["ortho6d"], embedding)
    trans = _head(params["translation"], embedding) + jnp.asarray(
        camera.POSENET_T_BIAS)
    R = camera.ortho6d_to_rotation(rot6d)          # [B,3,3]
    R = scale * R
    pred_RT = jnp.concatenate([R, trans[:, None, :]], axis=1)  # [B,4,3]
    out = {"pred_rotation": R, "pred_translation": trans, "pred_RT": pred_RT}
    if "xyshift" in params:
        out["pred_xyshift"] = _head(params["xyshift"], embedding)
    return out


def apply(params: Params, img: jnp.ndarray, cfg: Config,
          K: jnp.ndarray | None = None) -> dict[str, jnp.ndarray]:
    """img [B,137,137,3] -> end_points incl. pred_trans_mat [B,4,3]."""
    from disn_tpu.models import disn  # encoder preprocessing reuse
    cfg3 = cfg.replace(alpha=False)
    embedding, _ = disn.encode(params, img, cfg3)
    out = apply_heads(params["cameraprediction"], embedding)
    out["embedding"] = embedding
    if K is None:
        K = jnp.asarray(camera.K_137)
    pred_trans_mat = out["pred_RT"] @ K.T  # [B,4,3]
    out["pred_trans_mat"] = pred_trans_mat
    return out


def get_loss(end_points: dict[str, jnp.ndarray], batch: dict[str, jnp.ndarray],
             params: Params, cfg: Config
             ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Camera losses (cam_est/model_cam.py:125-239).

    modes: 3D  — L2 of (homo_pc @ pred_RT − homo_pc @ RT)
           2D  — L2 of projected-pixel difference / 1e4
           3DM — 3D + 0.3 * MSE(pred_trans_mat, trans_mat)
           all — 2D + 3D + matrix MSE
    batch: sample_pc [B,N,3], RT [B,4,3] (regress_mat), trans_mat [B,4,3],
           optional shifts [B,2].
    """
    sample_pc = batch["sample_pc"]
    RT = batch["RT"]
    trans_mat = batch["trans_mat"]
    pred_RT = end_points["pred_RT"]
    pred_trans_mat = end_points["pred_trans_mat"]

    ones = jnp.ones(sample_pc.shape[:-1] + (1,), sample_pc.dtype)
    homo = jnp.concatenate([sample_pc, ones], axis=-1)
    hp = jax.lax.Precision.HIGHEST
    rot_gt = jnp.matmul(homo, RT, precision=hp)
    rot_pred = jnp.matmul(homo, pred_RT, precision=hp)
    sub_3d = rot_pred - rot_gt

    xyshift = end_points.get("pred_xyshift")
    # the GT projection carries the GT image shift when shift augmentation is
    # on (the object was moved in the image): reference gt_xy includes
    # gt_xyshift (cam_est/model_cam.py:101, 119-120)
    gt_shift = batch.get("shifts") if cfg.cam_shift else None
    # the 2D LOSS uses raw (unclamped) projections — clamping would zero the
    # gradient whenever early-training predictions land outside the image
    gt_xy_raw = camera.project_points(sample_pc, trans_mat, clamp=False,
                                      img_w=cfg.img_w, img_h=cfg.img_h,
                                      xyshift=gt_shift)
    pred_xy_raw = camera.project_points(sample_pc, pred_trans_mat,
                                        clamp=False,
                                        img_w=cfg.img_w, img_h=cfg.img_h,
                                        xyshift=xyshift)
    gt_xy_cl = camera.project_points(sample_pc, trans_mat,
                                     img_w=cfg.img_w, img_h=cfg.img_h,
                                     xyshift=gt_shift)
    pred_xy_cl = camera.project_points(sample_pc, pred_trans_mat,
                                       img_w=cfg.img_w, img_h=cfg.img_h,
                                       xyshift=xyshift)

    losses: dict[str, jnp.ndarray] = {}
    # tf.nn.l2_loss = sum(x^2)/2; the reference wraps it in reduce_mean of a
    # scalar, so these are sums-of-squares halved.
    rotpc_loss = jnp.sum(jnp.square(sub_3d)) / 2.0
    rot2d_loss = jnp.sum(jnp.square(pred_xy_raw - gt_xy_raw)) / 2.0 / 1e4
    rotmatrix_loss = jnp.mean(jnp.square(pred_trans_mat - trans_mat))
    rot3d_dist = jnp.mean(jnp.sqrt(jnp.sum(jnp.square(sub_3d), axis=-1)))
    rot2d_dist = jnp.mean(jnp.sqrt(
        jnp.sum(jnp.square(pred_xy_cl - gt_xy_cl), axis=-1)))

    losses.update(rotpc_loss=rotpc_loss, rot2d_loss=rot2d_loss,
                  rotmatrix_loss=rotmatrix_loss, rot3d_dist=rot3d_dist,
                  rot2d_dist=rot2d_dist)

    mode = cfg.cam_loss_mode
    if mode == "3D":
        loss = rotpc_loss
    elif mode == "2D":
        loss = rot2d_loss
    elif mode == "3DM":
        loss = rotpc_loss + rotmatrix_loss * 0.3
    else:
        loss = rot2d_loss + rotpc_loss + rotmatrix_loss

    if cfg.cam_shift and xyshift is not None and "shifts" in batch:
        shift_loss = jnp.sum(jnp.square(batch["shifts"] - xyshift)) / 2.0
        losses["shiftxy_loss"] = shift_loss
        loss = loss + shift_loss * cfg.shift_weight

    if cfg.regularization:
        reg = layers.l2_regularizer(params["vgg_16"], cfg.weight_decay)
        losses["regularization"] = reg
        loss = loss + reg
    losses["overall_loss"] = loss
    return loss, losses
