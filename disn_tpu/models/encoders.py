"""Alternate image encoders (reference ships unused AlexNet and slim
ResNet-v1 wrappers: models/CNN/alexnet.py:25-211, models/CNN/resnet.py:1-46).

Provided for inventory parity with the same functional-params style as
models/vgg.py; selectable via Config.encoder once wired into disn.init (the
flagship model uses VGG-16, like every reference driver)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from disn_tpu.models import layers


# --------------------------------------------------------------------------
# AlexNet (models/CNN/alexnet.py layout: 5 convs + 3 fc)
# --------------------------------------------------------------------------

_ALEX = [
    # (name, k, stride, cout, pool)
    ("conv1", 11, 4, 96, True),
    ("conv2", 5, 1, 256, True),
    ("conv3", 3, 1, 384, False),
    ("conv4", 3, 1, 384, False),
    ("conv5", 3, 1, 256, True),
]


def init_alexnet(key: jax.Array, in_channels: int = 3,
                 num_classes: int = 1024, width_mult: float = 1.0) -> dict:
    from disn_tpu.models.vgg import scaled_width
    keys = jax.random.split(key, 8)
    params: dict = {}
    cin = in_channels
    for i, (name, k, _, cout, _) in enumerate(_ALEX):
        cout = scaled_width(cout, width_mult)
        params[name] = layers.init_conv(keys[i], k, k, cin, cout)
        cin = cout
    fc = scaled_width(4096, width_mult)
    params["fc6"] = layers.init_dense(keys[5], cin * 6 * 6, fc)
    params["fc7"] = layers.init_dense(keys[6], fc, fc)
    params["fc8"] = layers.init_dense(keys[7], fc, num_classes)
    return params


def apply_alexnet(params: dict, img: jnp.ndarray,
                  compute_dtype=jnp.float32) -> tuple[jnp.ndarray, dict]:
    """img [B,~224,~224,C] -> (embedding, endpoints)."""
    x = img
    endpoints = {}
    for name, _, stride, _, pool in _ALEX:
        x = layers.conv2d(params[name], x, stride=stride, padding="SAME",
                          compute_dtype=compute_dtype)
        endpoints[name] = x
        if pool:
            x = layers.max_pool2d(x, k=3, stride=2)
    x = x.reshape(x.shape[0], -1)
    x = layers.dense(params["fc6"], x, compute_dtype=compute_dtype)
    x = layers.dense(params["fc7"], x, compute_dtype=compute_dtype)
    x = layers.dense(params["fc8"], x, relu=False,
                     compute_dtype=compute_dtype)
    return x, endpoints


# Grouped conv layers in the BVLC reference weights (groups=2); the
# reference applies them as split convs (models/CNN/alexnet.py conv()
# groups branch) — here they fold into ONE dense conv with block-diagonal
# weights, which is numerically identical and MXU-friendly.
_ALEX_GROUPS = {"conv2": 2, "conv4": 2, "conv5": 2}


def load_alexnet_npy(path: str, params: dict) -> dict:
    """Load BVLC-style `bvlc_alexnet.npy` weights into an init_alexnet tree
    (reference `AlexNet.load_initial_weights`, models/CNN/alexnet.py:60-96:
    a pickled dict {layer: [weights, biases]}).

    Grouped conv weights [k,k,cin/g,cout] expand to block-diagonal dense
    weights. Layers whose shapes don't match the tree (e.g. fc8 at 1000
    ImageNet classes vs num_classes, or width_mult'd trees) are skipped —
    the same partial-restore semantics as train/checkpoint.py."""
    import numpy as np  # noqa: F811

    data = np.load(path, allow_pickle=True, encoding="latin1").item()
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for name, wb in data.items():
        if name not in out:
            continue
        w, b = np.asarray(wb[0], np.float32), np.asarray(wb[1], np.float32)
        g = _ALEX_GROUPS.get(name, 1)
        if w.ndim == 4 and g > 1:
            k1, k2, cpg, cout = w.shape
            opg = cout // g
            full = np.zeros((k1, k2, cpg * g, cout), np.float32)
            for i in range(g):
                full[:, :, i * cpg:(i + 1) * cpg, i * opg:(i + 1) * opg] = \
                    w[..., i * opg:(i + 1) * opg]
            w = full
        tgt = out[name]
        if tuple(tgt["weights"].shape) == w.shape \
                and tuple(tgt["biases"].shape) == b.shape:
            out[name] = {"weights": jnp.asarray(w), "biases": jnp.asarray(b)}
    return out


# --------------------------------------------------------------------------
# ResNet-v1 basic-block (18-layer scale; slim resnet_v1 analog)
# --------------------------------------------------------------------------

_RESNET18 = [(64, 2), (128, 2), (256, 2), (512, 2)]  # (width, blocks)


def init_resnet(key: jax.Array, in_channels: int = 3,
                num_classes: int = 1024, width_mult: float = 1.0) -> dict:
    from disn_tpu.models.vgg import scaled_width
    keys = iter(jax.random.split(key, 64))
    params: dict = {"conv1": layers.init_conv(next(keys), 7, 7, in_channels,
                                              scaled_width(64, width_mult))}
    cin = scaled_width(64, width_mult)
    for si, (width, blocks) in enumerate(_RESNET18):
        width = scaled_width(width, width_mult)
        stage: dict = {}
        for b in range(blocks):
            blk = {
                "conv_a": layers.init_conv(next(keys), 3, 3, cin, width),
                "conv_b": layers.init_conv(next(keys), 3, 3, width, width),
            }
            if cin != width:
                blk["proj"] = layers.init_conv(next(keys), 1, 1, cin, width)
            stage[f"block{b + 1}"] = blk
            cin = width
        params[f"stage{si + 1}"] = stage
    params["fc"] = layers.init_dense(next(keys), cin, num_classes)
    return params


def apply_resnet(params: dict, img: jnp.ndarray,
                 compute_dtype=jnp.float32) -> tuple[jnp.ndarray, dict]:
    x = layers.conv2d(params["conv1"], img, stride=2,
                      compute_dtype=compute_dtype)
    x = layers.max_pool2d(x, k=3, stride=2, padding="SAME")
    endpoints = {}
    for si in range(len(_RESNET18)):
        stage = params[f"stage{si + 1}"]
        for bi, bname in enumerate(sorted(stage)):
            blk = stage[bname]
            stride = 2 if (si > 0 and bi == 0) else 1
            h = layers.conv2d(blk["conv_a"], x, stride=stride,
                              compute_dtype=compute_dtype)
            h = layers.conv2d(blk["conv_b"], h, relu=False,
                              compute_dtype=compute_dtype)
            sc = x
            if "proj" in blk:
                sc = layers.conv2d(blk["proj"], x, stride=stride, relu=False,
                                   compute_dtype=compute_dtype)
            elif stride != 1:
                sc = layers.max_pool2d(x, k=1, stride=stride)
            x = jax.nn.relu(h + sc)
        endpoints[f"stage{si + 1}"] = x
    x = jnp.mean(x, axis=(1, 2))
    emb = layers.dense(params["fc"], x, relu=False,
                       compute_dtype=compute_dtype)
    return emb, endpoints
