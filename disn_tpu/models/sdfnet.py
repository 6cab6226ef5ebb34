"""SDF decoder heads (re-imagining models/sdfnet.py).

The reference implements its per-point MLPs as 1x1 convs over a [B, N, 1, C]
tensor (sdfnet.py:69-92, 171-190). On TPU those are plain dense matmuls over
the point axis — ideal MXU shapes ([B*N, C] x [C, C']). Param layout stores
dense kernels as [in, out]; the TF converter squeezes the conv kernels'
leading 1x1.

Head widths (exact reference parity):
  global stream  (get_sdf_basic2):          3 ->64->256->512, ++1024 global,
                                            ->512->256->1
  local  stream  (get_sdf_basic2_imgfeat_twostream):
                                            3 ->64->256->512, ++1472 local,
                                            ->512->256->1
  onestream      (get_sdf_basic2_imgfeat_onestream):
                                            3 ->64->256->512, ++1024++448,
                                            ->512->256->1
  3D-CNN         (get_sdf_3dcnn): 1024 -> deconv3d 128,128,128,64,64,32 -> 65^3
Binary variants end in 2 logits instead of 1.

Scope names in the param tree mirror the TF graph for checkpoint conversion:
fold1/conv1..conv3, fold2/conv1..conv2, fold2/conv5 (regression) or
fold2/conv5_bi (binary).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from disn_tpu.models import layers


def _init_point_mlp(key: jax.Array, concat_dim: int, out_dim: int) -> dict:
    k = jax.random.split(key, 6)
    last = "conv5_bi" if out_dim == 2 else "conv5"
    return {
        "fold1": {
            "conv1": layers.init_dense(k[0], 3, 64),
            "conv2": layers.init_dense(k[1], 64, 256),
            "conv3": layers.init_dense(k[2], 256, 512),
        },
        "fold2": {
            "conv1": layers.init_dense(k[3], 512 + concat_dim, 512),
            "conv2": layers.init_dense(k[4], 512, 256),
            last: layers.init_dense(k[5], 256, out_dim),
        },
    }


def init_global_head(key: jax.Array, global_dim: int = 1024,
                     binary: bool = False) -> dict:
    return _init_point_mlp(key, global_dim, 2 if binary else 1)


def init_local_head(key: jax.Array, local_dim: int = 1472,
                    binary: bool = False) -> dict:
    return _init_point_mlp(key, local_dim, 2 if binary else 1)


def init_onestream_head(key: jax.Array, global_dim: int = 1024,
                        local_dim: int = 448, binary: bool = False) -> dict:
    return _init_point_mlp(key, global_dim + local_dim, 2 if binary else 1)


def _apply_point_mlp(params: dict, pts: jnp.ndarray, concat: jnp.ndarray,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """pts: [B,N,3]; concat: [B,N,D] extra features appended after fold1."""
    cd = compute_dtype
    h = layers.dense(params["fold1"]["conv1"], pts, compute_dtype=cd)
    h = layers.dense(params["fold1"]["conv2"], h, compute_dtype=cd)
    h = layers.dense(params["fold1"]["conv3"], h, compute_dtype=cd)
    h = jnp.concatenate([h, concat.astype(h.dtype)], axis=-1)
    h = layers.dense(params["fold2"]["conv1"], h, compute_dtype=cd)
    h = layers.dense(params["fold2"]["conv2"], h, compute_dtype=cd)
    last = "conv5_bi" if "conv5_bi" in params["fold2"] else "conv5"
    return layers.dense(params["fold2"][last], h, relu=False, compute_dtype=cd)


def apply_global_head(params: dict, pts: jnp.ndarray, global_feat: jnp.ndarray,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """get_sdf_basic2: tile the [B,G] global embedding over points."""
    g = jnp.broadcast_to(global_feat[:, None, :],
                         (pts.shape[0], pts.shape[1], global_feat.shape[-1]))
    return _apply_point_mlp(params, pts, g, compute_dtype)


def apply_local_head(params: dict, pts: jnp.ndarray, local_feat: jnp.ndarray,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """get_sdf_basic2_imgfeat_twostream: [B,N,L] per-point local features."""
    return _apply_point_mlp(params, pts, local_feat, compute_dtype)


def split_local_fold2(params: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split fold2/conv1 W [512+L, 512] into (W_point [512,512], W_local
    [L,512]). Because feature sampling is linear, W_local can be FOLDED into
    the endpoint maps once per image: sample(map) @ W_l == sample(map @ W_l)
    — see infer/dense.py. Exactness (up to bf16 rounding order) is tested."""
    w = params["fold2"]["conv1"]["weights"]
    return w[:512], w[512:]


def apply_two_stream_split(global_params: dict, local_params: dict,
                           pts: jnp.ndarray, global_feat: jnp.ndarray,
                           local_feats: list[jnp.ndarray],
                           compute_dtype=jnp.float32) -> jnp.ndarray:
    """Two-stream decode with the fold2/conv1 matmuls SPLIT per input block:
    concat(x1..xn) @ W == sum(x_i @ W_i), so the [N,512+1472] concat buffer
    (and the [N,1024+512] one in the global stream) never materializes —
    profiling showed its assembly costing ~15% of dense inference.
    local_feats: per-scale sampled features [B,N,C_s] in vgg.ENDPOINTS order.
    Numerically identical to apply_global_head + apply_local_head up to bf16
    summation order."""
    cd = compute_dtype

    def fold1(params, h):
        h = layers.dense(params["fold1"]["conv1"], h, compute_dtype=cd)
        h = layers.dense(params["fold1"]["conv2"], h, compute_dtype=cd)
        return layers.dense(params["fold1"]["conv3"], h, compute_dtype=cd)

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w.astype(cd),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))

    def tail(params, pre):
        h = jax.nn.relu(pre)
        h = layers.dense(params["fold2"]["conv2"], h, compute_dtype=cd)
        last = "conv5_bi" if "conv5_bi" in params["fold2"] else "conv5"
        return layers.dense(params["fold2"][last], h, relu=False,
                            compute_dtype=cd)

    # global stream: concat(fold1, tiled global) @ W -> split
    hg = fold1(global_params, pts)
    wg = global_params["fold2"]["conv1"]["weights"]
    g_contrib = mm(global_feat, wg[512:])[:, None, :]  # [B,1,512] broadcast
    pre_g = (mm(hg, wg[:512]) + g_contrib
             + global_params["fold2"]["conv1"]["biases"].astype(cd))
    pred_g = tail(global_params, pre_g)

    # local stream: concat(fold1, scale_1..scale_5) @ W -> split per scale
    hl = fold1(local_params, pts)
    wl = local_params["fold2"]["conv1"]["weights"]
    pre_l = mm(hl, wl[:512]) + \
        local_params["fold2"]["conv1"]["biases"].astype(cd)
    off = 512
    for feat in local_feats:
        c = feat.shape[-1]
        pre_l = pre_l + mm(feat, wl[off:off + c])
        off += c
    pred_l = tail(local_params, pre_l)
    return pred_g + pred_l


def apply_two_stream_prefold(global_params: dict, local_params: dict,
                             pts: jnp.ndarray, g_contrib: jnp.ndarray,
                             local_contrib: jnp.ndarray,
                             compute_dtype=jnp.float32) -> jnp.ndarray:
    """Two-stream decode with BOTH per-image contributions precomputed.

    g_contrib [B,512] = embedding @ W_g[512:] (once per image); local_contrib
    [B,N,512] = the per-point sample of the folded 137-space feature map
    (infer/dense._prep fold='137'). The hot loop is then pure point MLP:
    fold1 (3->64->256->512), one 512x512 matmul + adds, and the 512->256->out
    tail per stream — no concat buffers, no per-point wide matmuls.
    Numerically identical to apply_two_stream_split up to float summation
    order (tested)."""
    cd = compute_dtype

    def fold1(params, h):
        h = layers.dense(params["fold1"]["conv1"], h, compute_dtype=cd)
        h = layers.dense(params["fold1"]["conv2"], h, compute_dtype=cd)
        return layers.dense(params["fold1"]["conv3"], h, compute_dtype=cd)

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w.astype(cd),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))

    def tail(params, pre):
        h = jax.nn.relu(pre)
        h = layers.dense(params["fold2"]["conv2"], h, compute_dtype=cd)
        last = "conv5_bi" if "conv5_bi" in params["fold2"] else "conv5"
        return layers.dense(params["fold2"][last], h, relu=False,
                            compute_dtype=cd)

    hg = fold1(global_params, pts)
    wg = global_params["fold2"]["conv1"]["weights"]
    pre_g = (mm(hg, wg[:512]) + g_contrib.astype(cd)[:, None, :]
             + global_params["fold2"]["conv1"]["biases"].astype(cd))
    pred_g = tail(global_params, pre_g)

    hl = fold1(local_params, pts)
    wl = local_params["fold2"]["conv1"]["weights"]
    pre_l = (mm(hl, wl[:512]) + local_contrib.astype(cd)
             + local_params["fold2"]["conv1"]["biases"].astype(cd))
    pred_l = tail(local_params, pre_l)
    return pred_g + pred_l


def apply_local_head_folded(params: dict, pts: jnp.ndarray,
                            local_contrib: jnp.ndarray,
                            compute_dtype=jnp.float32) -> jnp.ndarray:
    """Local stream with the local-feature matmul pre-folded into the maps:
    local_contrib [B,N,512] = sampled (map @ W_local) summed over scales."""
    cd = compute_dtype
    h = layers.dense(params["fold1"]["conv1"], pts, compute_dtype=cd)
    h = layers.dense(params["fold1"]["conv2"], h, compute_dtype=cd)
    h = layers.dense(params["fold1"]["conv3"], h, compute_dtype=cd)
    w_point, _ = split_local_fold2(params)
    b = params["fold2"]["conv1"]["biases"]
    pre = (jax.lax.dot_general(
        h.astype(cd), w_point.astype(cd),
        dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())))
        + local_contrib.astype(cd) + b.astype(cd))
    h = jax.nn.relu(pre)
    h = layers.dense(params["fold2"]["conv2"], h, compute_dtype=cd)
    last = "conv5_bi" if "conv5_bi" in params["fold2"] else "conv5"
    return layers.dense(params["fold2"][last], h, relu=False, compute_dtype=cd)


def apply_onestream_head(params: dict, pts: jnp.ndarray,
                         global_feat: jnp.ndarray, local_feat: jnp.ndarray,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.broadcast_to(global_feat[:, None, :],
                         (pts.shape[0], pts.shape[1], global_feat.shape[-1]))
    concat = jnp.concatenate([g, local_feat.astype(g.dtype)], axis=-1)
    return _apply_point_mlp(params, pts, concat, compute_dtype)


# --------------------------------------------------------------------------
# 3D-CNN volume decoder (get_sdf_3dcnn, sdfnet.py:4-35): 1024 global embedding
# -> transpose-conv stack 2,4,8,16,32 -> 65 (VALID) -> 1x1x1 conv head.
# --------------------------------------------------------------------------

_3D_STACK = [
    ("3deconv1", (2, 2, 2), 128, "SAME"),
    ("3deconv2", (3, 3, 3), 128, "SAME"),
    ("3deconv3", (3, 3, 3), 128, "SAME"),
    ("3deconv4", (3, 3, 3), 64, "SAME"),
    ("3deconv5", (3, 3, 3), 64, "SAME"),
    ("3deconv6", (3, 3, 3), 32, "VALID"),
]


def init_3dcnn_head(key: jax.Array, global_dim: int = 1024,
                    binary: bool = False) -> dict:
    keys = jax.random.split(key, len(_3D_STACK) + 1)
    params: dict = {}
    cin = global_dim
    for i, (name, k, cout, _) in enumerate(_3D_STACK):
        params[name] = layers.init_conv3d_transpose(keys[i], k, cin, cout)
        cin = cout
    out = 2 if binary else 1
    head_name = "3conv7_binary" if binary else "3conv7"
    params[head_name] = {
        "weights": layers.xavier_uniform(keys[-1], (1, 1, 1, cin, out)),
        "biases": jnp.zeros((out,), jnp.float32),
    }
    return params


def apply_3dcnn_head(params: dict, global_feat: jnp.ndarray,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B,G] -> [B, 65^3, 1|2] volume logits (x fastest in flat order)."""
    b = global_feat.shape[0]
    x = global_feat.reshape(b, 1, 1, 1, -1)
    for name, _, _, pad in _3D_STACK:
        x = layers.conv3d_transpose(params[name], x, stride=(2, 2, 2),
                                    padding=pad, compute_dtype=compute_dtype)
    head_name = "3conv7_binary" if "3conv7_binary" in params else "3conv7"
    w = params[head_name]["weights"].astype(jnp.float32)
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ) + params[head_name]["biases"]
    out = x.shape[-1]
    return x.reshape(b, -1, out)
