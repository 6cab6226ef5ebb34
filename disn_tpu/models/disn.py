"""The DISN model graph: encoder -> per-point local features -> SDF heads.

Pure-function re-imagining of models/model_normalization.py. The TF1 graph's
placeholder/session split becomes a single jitted ``apply``; the architecture
booleans become cfg.variant (config.py). Param-tree top-level keys mirror the
TF variable scopes (vgg_16, sdfprediction, sdfprediction_imgfeat, sdfimgfeat,
sdf3dcnn) so checkpoint conversion is mechanical.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from disn_tpu.config import Config, EncoderKind, Variant
from disn_tpu.core import camera
from disn_tpu.models import sdfnet, vgg
from disn_tpu.models import layers
from disn_tpu.ops import image as image_ops

Params = dict[str, Any]


ENCODER_SCOPE = {EncoderKind.VGG16: "vgg_16",
                 EncoderKind.ALEXNET: "alexnet",
                 EncoderKind.RESNET: "resnet_v1"}  # TF-scope-mirrored names

_ALEX_ENDPOINTS = ("conv1", "conv2", "conv3", "conv4", "conv5")
_RESNET_ENDPOINTS = ("stage1", "stage2", "stage3", "stage4")


def endpoint_names(cfg: Config) -> tuple[str, ...]:
    """Encoder endpoint maps used for local features, concatenation order
    (VGG: model_normalization.py:171-190; onestream keeps the first 3)."""
    names = {EncoderKind.VGG16: vgg.ENDPOINTS,
             EncoderKind.ALEXNET: _ALEX_ENDPOINTS,
             EncoderKind.RESNET: _RESNET_ENDPOINTS}[cfg.encoder]
    return names if cfg.variant is Variant.TWOSTREAM else names[:3]


def init_encoder(cfg: Config, key: jax.Array):
    from disn_tpu.models import encoders
    kw = dict(in_channels=cfg.img_channels, num_classes=cfg.num_classes,
              width_mult=cfg.width_mult)
    if cfg.encoder is EncoderKind.ALEXNET:
        return encoders.init_alexnet(key, **kw)
    if cfg.encoder is EncoderKind.RESNET:
        return encoders.init_resnet(key, **kw)
    return vgg.init(key, **kw)


def init(cfg: Config, key: jax.Array) -> Params:
    k_vgg, k_a, k_b = jax.random.split(key, 3)
    params: Params = {ENCODER_SCOPE[cfg.encoder]: init_encoder(cfg, k_vgg)}
    if cfg.variant is Variant.TWOSTREAM:
        params["sdfprediction"] = sdfnet.init_global_head(
            k_a, cfg.num_classes, cfg.binary)
        params["sdfprediction_imgfeat"] = sdfnet.init_local_head(
            k_b, cfg.local_feat_dim, cfg.binary)
    elif cfg.variant is Variant.ONESTREAM:
        params["sdfimgfeat"] = sdfnet.init_onestream_head(
            k_a, cfg.num_classes, cfg.local_feat_dim, cfg.binary)
    elif cfg.variant is Variant.GLOBAL:
        params["sdfprediction"] = sdfnet.init_global_head(
            k_a, cfg.num_classes, cfg.binary)
    elif cfg.variant is Variant.THREEDCNN:
        params["sdf3dcnn"] = sdfnet.init_3dcnn_head(
            k_a, cfg.num_classes, cfg.binary)
    return params


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def preprocess_image(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Resize [B,137,137,C] -> [B,224,224,C]: bilinear RGB, nearest alpha
    (model_normalization.py:65-73)."""
    if img.shape[1] == cfg.vgg_size and img.shape[2] == cfg.vgg_size:
        return img
    if cfg.alpha:
        rgb = image_ops.resize_bilinear(img[..., :3], cfg.vgg_size, cfg.vgg_size)
        a = image_ops.resize_nearest(img[..., 3:4], cfg.vgg_size, cfg.vgg_size)
        return jnp.concatenate([rgb, a], axis=-1)
    return image_ops.resize_bilinear(img, cfg.vgg_size, cfg.vgg_size)


def encode(params: Params, img: jnp.ndarray, cfg: Config
           ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Image [B,137,137,C] -> (global embedding [B,1024], endpoints).

    uint8 inputs are normalized on-device: the h5 sources are u8, and
    shipping u8 over the tunnel is 4x fewer host->device bytes — the
    ~225 KB f32 image upload sat on the e2e critical path before phase_a
    could start (~4-7 ms at the link's 22-50 MB/s). Eager-mode it is
    bit-identical to the host astype/divide it replaces; under jit, XLA
    may fold the /255 into downstream convs (reassociation), measured
    ~3e-5 coordinate drift on one demo vertex — same class, and far
    smaller, than the bf16 compute-path drift."""
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    resized = preprocess_image(img, cfg)
    cd = _compute_dtype(cfg)
    if cfg.encoder is EncoderKind.ALEXNET:
        from disn_tpu.models import encoders
        return encoders.apply_alexnet(params["alexnet"], resized,
                                      compute_dtype=cd)
    if cfg.encoder is EncoderKind.RESNET:
        from disn_tpu.models import encoders
        return encoders.apply_resnet(params["resnet_v1"], resized,
                                     compute_dtype=cd)
    return vgg.apply(params["vgg_16"], resized, compute_dtype=cd)


def sample_local_features(endpoints: dict[str, jnp.ndarray],
                          img_points: jnp.ndarray, cfg: Config,
                          fused: bool = True) -> jnp.ndarray:
    """Per-point multi-scale local features [B,N,1472|448].

    Reference path (model_normalization.py:171-190): resize each endpoint map
    to 137x137 (TF1 bilinear) and bilinearly resample at the projected pixel
    coords. ``fused=True`` uses the 16-tap composition that never materializes
    the resized maps (ops/image.resize_then_sample); both paths are
    numerically pinned to each other in tests.
    """
    names = endpoint_names(cfg)
    feats = []
    for name in names:
        fmap = endpoints[name]
        if cfg.sampling == "native":
            feats.append(image_ops.sample_native(
                fmap, img_points, cfg.img_h, cfg.img_w))
        elif fused:
            feats.append(image_ops.resize_then_sample(
                fmap, img_points, cfg.img_h, cfg.img_w))
        else:
            resized = image_ops.resize_bilinear(fmap, cfg.img_h, cfg.img_w)
            feats.append(image_ops.resampler(resized, img_points))
    return jnp.concatenate(feats, axis=-1)


def apply(params: Params, batch: dict[str, jnp.ndarray], cfg: Config,
          fused_sampling: bool = True, fold: bool = False
          ) -> dict[str, jnp.ndarray]:
    """Forward pass.

    batch keys:
      img        [B,137,137,C] float in [0,1]
      sample_pc  [B,N,3]   query points (model frame)
      sample_pc_rot [B,N,3] optionally view-rotated copy fed to the MLPs
      trans_mat  [B,4,3]   world->pixel right-multiply matrix
    Returns end_points with pred_sdf [B,N,1|2] plus intermediates.

    fold=True (twostream + tf1 sampling only; the trainer's default) takes
    the folded-137 form (infer/dense.normalize_fold): the five endpoint
    maps and the per-point 1472->512 matmul collapse into ONE per-image
    [137,137,512] map, so per-point sampling is 4 gather rows instead of
    80 — and, under grad, 4 scatter rows in the backward pass. The train
    step measured SAMPLING-bound, not FLOP-bound (3.6 steps/s at tf1 ==
    f32 == bf16 vs 16.8 at native-4-tap, B=20 full width on v5e;
    scripts/probe_train_throughput round 5); folding is the same linear
    algebra, so gradients match up to float summation order. The folded
    path skips the point_img_feat / per-stream intermediates (the loss
    reads only pred_sdf)."""
    img = batch["img"]
    cd = _compute_dtype(cfg)
    embedding, endpoints = encode(params, img, cfg)
    end_points: dict[str, jnp.ndarray] = {"img_embedding": embedding}

    pts_dec = batch.get("sample_pc_rot", batch["sample_pc"])

    if cfg.variant is Variant.THREEDCNN:
        pred = sdfnet.apply_3dcnn_head(params["sdf3dcnn"], embedding, cd)
    elif cfg.variant is Variant.GLOBAL:
        pred = sdfnet.apply_global_head(
            params["sdfprediction"], batch["sample_pc"], embedding, cd)
    else:
        img_points = camera.project_points(
            batch["sample_pc"], batch["trans_mat"],
            img_w=cfg.img_w, img_h=cfg.img_h)
        end_points["sample_img_points"] = img_points
        if (fold and cfg.variant is Variant.TWOSTREAM
                and cfg.sampling == "tf1"):
            cd_ = cd
            _, w_local = sdfnet.split_local_fold2(
                params["sdfprediction_imgfeat"])
            w_local = w_local.astype(cd_)
            merged = None
            off = 0
            for n in endpoint_names(cfg):
                ch = endpoints[n].shape[-1]
                f = jnp.einsum("bhwc,cd->bhwd", endpoints[n].astype(cd_),
                               w_local[off:off + ch])
                off += ch
                r = image_ops.resize_bilinear(f, cfg.img_h, cfg.img_w)
                merged = r if merged is None else merged + r
            wg = params["sdfprediction"]["fold2"]["conv1"]["weights"]
            g_contrib = jax.lax.dot_general(
                embedding.astype(cd_), wg[512:].astype(cd_),
                dimension_numbers=(((1,), (0,)), ((), ())))
            local_contrib = image_ops.resampler(merged, img_points)
            pred = sdfnet.apply_two_stream_prefold(
                params["sdfprediction"], params["sdfprediction_imgfeat"],
                pts_dec, g_contrib, local_contrib, cd_)
            if cfg.tanh:
                pred = jnp.tanh(pred)
            end_points["pred_sdf"] = pred
            return end_points
        local = sample_local_features(endpoints, img_points, cfg,
                                      fused=fused_sampling)
        end_points["point_img_feat"] = local
        if cfg.variant is Variant.TWOSTREAM:
            pred_global = sdfnet.apply_global_head(
                params["sdfprediction"], pts_dec, embedding, cd)
            pred_local = sdfnet.apply_local_head(
                params["sdfprediction_imgfeat"], pts_dec, local, cd)
            end_points["pred_sdf_value_global"] = pred_global
            end_points["pred_sdf_value_local"] = pred_local
            pred = pred_global + pred_local
        else:  # ONESTREAM
            pred = sdfnet.apply_onestream_head(
                params["sdfimgfeat"], pts_dec, embedding, local, cd)

    if cfg.tanh:
        pred = jnp.tanh(pred)
    end_points["pred_sdf"] = pred
    return end_points


def decode_from_features(params: Params, pts: jnp.ndarray,
                         embedding: jnp.ndarray, local_feat: jnp.ndarray,
                         cfg: Config) -> jnp.ndarray:
    """Multi-view fusion path (get_decoder, model_normalization.py:223-238):
    re-run the two streams from precomputed (e.g. view-averaged) features."""
    cd = _compute_dtype(cfg)
    g = sdfnet.apply_global_head(params["sdfprediction"], pts, embedding, cd)
    l = sdfnet.apply_local_head(params["sdfprediction_imgfeat"], pts,
                                local_feat, cd)
    return g + l


def get_loss(end_points: dict[str, jnp.ndarray], gt_sdf: jnp.ndarray,
             params: Params, cfg: Config) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Loss (model_normalization.py:254-300).

    Regression: weighted L1 on (gt*10 - pred), near-surface (gt<=0.01) points
    weighted x4, overall x1000; plus L2 weight decay over every kernel.
    Binary: softmax CE on sign labels x100.
    gt_sdf: [B,N,1] (already iso-offset by the caller when training).
    """
    pred = end_points["pred_sdf"].astype(jnp.float32)
    gt_sdf = gt_sdf.astype(jnp.float32)
    losses: dict[str, jnp.ndarray] = {}
    if cfg.binary:
        labels = (gt_sdf[..., 0] > 0).astype(jnp.int32)
        logp = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        sdf_loss = jnp.mean(ce) * 100.0
        acc = jnp.mean((jnp.argmax(pred, axis=-1) == labels).astype(jnp.float32))
        losses["accuracy"] = acc
    else:
        gt_sign = gt_sdf > 0
        pred_sign = pred > 0
        losses["accuracy"] = jnp.mean((gt_sign == pred_sign).astype(jnp.float32))
        weight_mask = (jnp.where(gt_sdf <= cfg.mask_margin, cfg.mask_weight, 0.0)
                       + jnp.where(gt_sdf > cfg.mask_margin, 1.0, 0.0))
        sdf_loss = jnp.mean(
            jnp.abs(gt_sdf * cfg.sdf_weight - pred) * weight_mask) * 1000.0
        losses["sdf_loss_realvalue"] = jnp.mean(
            jnp.abs(gt_sdf - pred / cfg.sdf_weight))
    losses["sdf_loss"] = sdf_loss
    loss = sdf_loss
    if cfg.regularization:
        reg = layers.l2_regularizer(params, cfg.weight_decay)
        losses["regularization"] = reg
        loss = loss + reg
    losses["overall_loss"] = loss
    return loss, losses
