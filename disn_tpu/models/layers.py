"""Minimal functional layer library (replaces utils/tf_util.py, 616 LoC of TF1
wrappers).

Params are plain pytrees: ``{"weights": [kh,kw,in,out] | [in,out], "biases":
[out]}`` with TF-compatible layouts so TF1 checkpoints convert by name+reshape
only. All layers are pure functions; there is no variable store, collection,
or session. Weight decay is computed by ``l2_regularizer`` over the tree
instead of TF's side-channel collections (tf_util.py:23-48).

Compute dtype: convs/matmuls optionally run in bfloat16 (the TPU MXU
accumulates bf16 matmuls in float32 internally; outputs round to bf16 per
layer, the standard mixed-precision recipe). Params always live in float32.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def _fans(shape: tuple[int, ...]) -> tuple[float, float]:
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def xavier_uniform(key: jax.Array, shape: tuple[int, ...],
                   dtype=jnp.float32) -> jnp.ndarray:
    """Glorot/Xavier uniform — the default of slim.conv2d and
    tf_util's xavier initializer."""
    fan_in, fan_out = _fans(shape)
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def truncated_normal(key: jax.Array, shape: tuple[int, ...], stddev: float,
                     dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev


def init_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> Params:
    return {
        "weights": xavier_uniform(key, (kh, kw, cin, cout)),
        "biases": jnp.zeros((cout,), jnp.float32),
    }


def init_dense(key: jax.Array, cin: int, cout: int,
               stddev: float | None = None) -> Params:
    if stddev is None:
        w = xavier_uniform(key, (cin, cout))
    else:
        w = truncated_normal(key, (cin, cout), stddev)
    return {"weights": w, "biases": jnp.zeros((cout,), jnp.float32)}


def init_conv3d_transpose(key: jax.Array, k: tuple[int, int, int],
                          cin: int, cout: int) -> Params:
    kd, kh, kw = k
    return {
        "weights": xavier_uniform(key, (kd, kh, kw, cin, cout)),
        "biases": jnp.zeros((cout,), jnp.float32),
    }


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding: str = "SAME",
           relu: bool = True, compute_dtype=jnp.float32) -> jnp.ndarray:
    """NHWC conv with TF-layout HWIO kernel. Accumulates in float32."""
    w = p["weights"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["biases"].astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    # cast back to the compute dtype: keeps fwd/bwd operand dtypes consistent
    # under grad (f32 accumulation happens inside the conv)
    return y.astype(compute_dtype)


def dense(p: Params, x: jnp.ndarray, relu: bool = True,
          compute_dtype=jnp.float32) -> jnp.ndarray:
    """[..., in] @ [in, out] + b; f32 accumulation."""
    w = p["weights"].astype(compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
    )
    y = y + p["biases"].astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(compute_dtype)


def max_pool2d(x: jnp.ndarray, k: int = 2, stride: int = 2,
               padding: str = "VALID") -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def conv3d_transpose(p: Params, x: jnp.ndarray, stride: tuple[int, int, int],
                     padding: str = "SAME", relu: bool = True,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """NDHWC transpose conv with DHWIO kernel (tf_util.conv3d_transpose)."""
    w = p["weights"].astype(compute_dtype)
    y = jax.lax.conv_transpose(
        x.astype(compute_dtype), w,
        strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    y = y + p["biases"].astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(compute_dtype)


def init_batch_norm(c: int) -> Params:
    """gamma/beta + moving moments, tf.contrib.layers.batch_norm layout
    (reference utils/tf_util.py:513-532 batch_norm_template, decay 0.9)."""
    return {"gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32),
            "moving_mean": jnp.zeros((c,), jnp.float32),
            "moving_variance": jnp.ones((c,), jnp.float32)}


def batch_norm(p: Params, x: jnp.ndarray, is_training: bool = False,
               decay: float = 0.9, eps: float = 1e-3
               ) -> tuple[jnp.ndarray, Params]:
    """Batch normalization over all leading axes (BC / BHWC / BDHWC — the
    reference's batch_norm_for_fc / _for_conv2d / _for_conv3d all reduce
    every axis but channels; tf_util.py:536-583). Returns (normed, new_p):
    in training mode new_p carries EMA-updated moving moments
    (updates_collections=None semantics — update applied in-step); in
    inference mode the moving moments normalize and new_p is p.

    The reference runs its encoder with bn=False everywhere, so nothing in
    the shipped models calls this at runtime — inventory parity for
    SURVEY §2 row 9 (round-2 verdict item 8)."""
    axes = tuple(range(x.ndim - 1))
    if is_training:
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        new_p = dict(
            p,
            moving_mean=decay * p["moving_mean"] + (1 - decay) * mean,
            moving_variance=decay * p["moving_variance"] + (1 - decay) * var)
    else:
        mean, var = p["moving_mean"], p["moving_variance"]
        new_p = p
    inv = jax.lax.rsqrt(var + eps) * p["gamma"]
    normed = (x.astype(jnp.float32) - mean) * inv + p["beta"]
    return normed.astype(x.dtype), new_p


def dropout(key: jax.Array, x: jnp.ndarray, rate: float = 0.5,
            is_training: bool = True,
            noise_shape: tuple[int, ...] | None = None) -> jnp.ndarray:
    """Inverted dropout, tf.nn.dropout semantics with keep_prob = 1-rate
    (reference tf_util.dropout:585-607; is_training=False is identity —
    how every reference graph actually runs it)."""
    if not is_training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = noise_shape if noise_shape is not None else x.shape
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


def l2_regularizer(params: Any, scale: float) -> jnp.ndarray:
    """scale * sum over all 'weights' leaves of ||w||^2/2 — matches
    slim.l2_regularizer + tf_util._variable_with_weight_decay semantics
    (biases excluded)."""
    total = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "weights":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32))) / 2.0
    return scale * total


def param_count(params: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
