"""VGG-16 encoder (slim layout) as pure functions.

Mirrors slim's vgg_16 as invoked by the reference
(models/CNN/vgg.py:144-240, called at model_normalization.py:74-77 with
num_classes=1024, is_training=False, spatial_squeeze=False):

  conv1(2x64) pool conv2(2x128) pool conv3(3x256) pool conv4(3x512) pool
  conv5(3x512) pool fc6(7x7x4096 VALID) fc7(1x1x4096) fc8(1x1xnum_classes)

Dropout layers are no-ops (the reference always runs the encoder with
is_training=False). The endpoints dict exposes the post-ReLU conv activations
used for local-feature sampling: conv1_2, conv2_2, conv3_3, conv4_3, conv5_3.

Param tree mirrors the TF checkpoint names so the TF1 converter is a rename:
params["conv1"]["conv1_1"]["weights"] <-> vgg_16/conv1/conv1_1/weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from disn_tpu.models import layers

# (block, [layer names], out_channels)
_CFG = [
    ("conv1", ["conv1_1", "conv1_2"], 64),
    ("conv2", ["conv2_1", "conv2_2"], 128),
    ("conv3", ["conv3_1", "conv3_2", "conv3_3"], 256),
    ("conv4", ["conv4_1", "conv4_2", "conv4_3"], 512),
    ("conv5", ["conv5_1", "conv5_2", "conv5_3"], 512),
]

# endpoints sampled for local features (model_normalization.py:171-185)
ENDPOINTS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
ENDPOINT_CHANNELS = (64, 128, 256, 512, 512)


def scaled_width(c: int, width_mult: float) -> int:
    """Channel width under a test/CI scale factor (1.0 = exact VGG-16)."""
    return c if width_mult == 1.0 else max(8, int(round(c * width_mult)))


def init(key: jax.Array, in_channels: int = 3, num_classes: int = 1024,
         width_mult: float = 1.0) -> dict:
    params: dict = {}
    cin = in_channels
    keys = jax.random.split(key, 16)
    ki = 0
    for block, names, cout in _CFG:
        cout = scaled_width(cout, width_mult)
        params[block] = {}
        for name in names:
            params[block][name] = layers.init_conv(keys[ki], 3, 3, cin, cout)
            ki += 1
            cin = cout
    fc = scaled_width(4096, width_mult)
    params["fc6"] = layers.init_conv(keys[ki], 7, 7, cin, fc); ki += 1
    params["fc7"] = layers.init_conv(keys[ki], 1, 1, fc, fc); ki += 1
    params["fc8"] = layers.init_conv(keys[ki], 1, 1, fc, num_classes)
    return params


def apply(params: dict, img: jnp.ndarray, compute_dtype=jnp.float32
          ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """img: [B, 224, 224, C] in [0,1] (the reference feeds raw /255 images,
    no mean subtraction). Returns (embedding [B, num_classes], endpoints)."""
    x = img
    endpoints: dict[str, jnp.ndarray] = {}
    for block, names, _ in _CFG:
        for name in names:
            x = layers.conv2d(params[block][name], x,
                              compute_dtype=compute_dtype)
            endpoints[name] = x
        x = layers.max_pool2d(x)
    kh, kw = params["fc6"]["weights"].shape[:2]
    if x.shape[1] == kh and x.shape[2] == kw:
        # the 7x7 VALID 'conv' collapses to ONE matmul: flatten (h,w,c) in
        # HWIO order. XLA's conv lowering leaves ~25x on the table for this
        # B=1 degenerate case on TPU (measured ~8 ms vs the 205 MB weight
        # read it actually is).
        b = x.shape[0]
        w6 = params["fc6"]["weights"].reshape(-1,
                                              params["fc6"]["weights"]
                                              .shape[-1])
        h = layers.dense({"weights": w6, "biases": params["fc6"]["biases"]},
                         x.reshape(b, -1), compute_dtype=compute_dtype)
        h = layers.dense({"weights": params["fc7"]["weights"][0, 0],
                          "biases": params["fc7"]["biases"]}, h,
                         compute_dtype=compute_dtype)
        h = layers.dense({"weights": params["fc8"]["weights"][0, 0],
                          "biases": params["fc8"]["biases"]}, h, relu=False,
                         compute_dtype=compute_dtype)
        return h, endpoints
    x = layers.conv2d(params["fc6"], x, padding="VALID",
                      compute_dtype=compute_dtype)
    x = layers.conv2d(params["fc7"], x, compute_dtype=compute_dtype)
    x = layers.conv2d(params["fc8"], x, relu=False,
                      compute_dtype=compute_dtype)
    embedding = x.reshape(x.shape[0], x.shape[-1])  # squeeze 1x1 spatial
    return embedding, endpoints
