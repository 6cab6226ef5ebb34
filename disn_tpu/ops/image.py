"""TF1-exact image resampling ops, built TPU-first.

The reference's local-feature quality hinges on two TF1 ops whose coordinate
conventions must be matched exactly (SURVEY.md "hard parts"):

* ``tf.image.resize_bilinear`` with the TF1 defaults ``align_corners=False,
  half_pixel_centers=False`` — the LEGACY mapping ``src = dst * (in/out)``
  (model_normalization.py:65-73, 171-185).
* ``tf.contrib.resampler.resampler`` — bilinear gather at continuous (x, y)
  pixel coordinates, zero outside the image (model_normalization.py:93-118).

Bilinear resize is expressed as two dense matmuls with static interpolation
matrices: each output row/col has exactly two source taps, so the matrices are
2-sparse, but on TPU a [out,in] x [in,*] matmul rides the MXU and XLA fuses the
pair — faster than gather at these sizes and bit-exact.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] TF1-legacy bilinear interpolation matrix (align_corners=False,
    half_pixel_centers=False): src = dst * in/out, lower = floor(src),
    upper = min(lower+1, in-1)."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        t = src - lo
        w[o, lo] += 1.0 - t
        w[o, hi] += t
    return w


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF1 tf.image.resize_bilinear (legacy coords). img: [B,H,W,C] -> [B,out_h,out_w,C].

    Interpolation runs in float32 regardless of input dtype (matching TF's
    float compute), result is cast back to the input dtype.
    """
    b, h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    dtype = img.dtype
    x = img.astype(jnp.float32)
    wh = jnp.asarray(_interp_matrix(out_h, h))   # [out_h, H]
    ww = jnp.asarray(_interp_matrix(out_w, w))   # [out_w, W]
    # HIGHEST precision: the default TPU f32 matmul path rounds operands to
    # bfloat16; interpolation weights must stay exact for TF1 parity.
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=hp)
    x = jnp.einsum("pw,bhwc->bhpc", ww, x, precision=hp)
    return x.astype(dtype)


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF1 tf.image.resize_nearest_neighbor (legacy coords):
    src = min(floor(dst * in/out), in-1). Used for alpha channels
    (model_normalization.py:68-69)."""
    b, h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    iy = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int32), h - 1)
    ix = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int32), w - 1)
    return img[:, jnp.asarray(iy)][:, :, jnp.asarray(ix)]


def resampler(data: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample data [B,H,W,C] at coords [B,N,2] (x, y) -> [B,N,C].

    Matches tf.contrib.resampler.resampler: (x, y) are continuous pixel
    coordinates with (0,0) at the corner pixel; values outside
    [0, W-1] x [0, H-1] contribute zero. DISN clamps its projected coords to
    the valid box first (model_normalization.py:249-251), so the zero-padding
    path only matters for exactness at the boundary.
    """
    b, h, w, c = data.shape
    x, y = coords[..., 0], coords[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    tx = (x - x0f)[..., None]
    ty = (y - y0f)[..., None]
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)

    flat = data.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(data.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def resampler_clamped(data: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with edge-clamped taps (replicate padding) instead of
    the zero-padding of tf.contrib.resampler. Used by the fast 'native'
    sampling mode where scaled coordinates may land in the last half-pixel."""
    b, h, w, c = data.shape
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    tx = (x - x0f)[..., None].astype(data.dtype)
    ty = (y - y0f)[..., None].astype(data.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    flat = data.reshape(b, h * w, c)

    def g(yi, xi):
        return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

    top = g(y0, x0) * (1 - tx) + g(y0, x1) * tx
    bot = g(y1, x0) * (1 - tx) + g(y1, x1) * tx
    return top * (1 - ty) + bot * ty


def sample_native(feat: jnp.ndarray, coords: jnp.ndarray,
                  out_h: int, out_w: int) -> jnp.ndarray:
    """Fast sampling mode: 4 taps directly on the ORIGINAL feature map at
    TF1-legacy-scaled coordinates (src = dst * in/out), replicate padding.

    NOT bit-equal to resize_then_sample: the composed tf1 path linearly
    interpolates between pre-resized samples (a chord across source-texel
    kinks) while this samples the source tent directly — both reproduce
    linear maps exactly and differ only sub-texel (see tests). 4x fewer
    memory taps; selected by Config.sampling = 'native'.
    """
    h, w = feat.shape[1], feat.shape[2]
    scale = jnp.asarray([w / out_w, h / out_h], coords.dtype)
    return resampler_clamped(feat, coords * scale)


def resize_then_sample(feat: jnp.ndarray, coords: jnp.ndarray,
                       out_h: int, out_w: int) -> jnp.ndarray:
    """resize_bilinear(feat, out) then resampler at coords — the reference's
    per-scale local-feature op (model_normalization.py:171-185) — WITHOUT
    materializing the [B,out_h,out_w,C] resized map.

    The composition is itself sparse: resampling the resized map at (x, y)
    mixes 4 resized pixels, each of which mixes at most 2x2 source pixels —
    at most 16 source taps total. We precompute the per-output-pixel source
    tap indices/weights (static lookup tables) and gather the 16 taps with
    combined weights. Exactness is pinned against the materializing path in
    tests.
    """
    b, h, w, c = feat.shape
    x, y = coords[..., 0], coords[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    tx = (x - x0f)[..., None]
    ty = (y - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, out_w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, out_h - 1)
    x1 = jnp.minimum(x0 + 1, out_w - 1)
    y1 = jnp.minimum(y0 + 1, out_h - 1)
    # at the right/bottom boundary tx==0 so the clamped duplicate tap is inert

    def taps(out_size, in_size):
        scale = in_size / out_size
        src = np.arange(out_size) * scale
        lo = np.floor(src).astype(np.int32)
        hi = np.minimum(lo + 1, in_size - 1)
        t = (src - lo).astype(np.float32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(t)

    ylo, yhi, yt = taps(out_h, h)
    xlo, xhi, xt = taps(out_w, w)

    flat = feat.reshape(b, h * w, c).astype(jnp.float32)

    def sample_resized(oy, ox):
        """Value of the virtually-resized map at integer output pixel (oy, ox):
        a 2x2 source-tap bilinear mix. [B,N,C]"""
        sy0, sy1, wty = ylo[oy], yhi[oy], yt[oy][..., None]
        sx0, sx1, wtx = xlo[ox], xhi[ox], xt[ox][..., None]

        def g(yi, xi):
            idx = yi * w + xi
            return jnp.take_along_axis(flat, idx[..., None], axis=1)

        top = g(sy0, sx0) * (1 - wtx) + g(sy0, sx1) * wtx
        bot = g(sy1, sx0) * (1 - wtx) + g(sy1, sx1) * wtx
        return top * (1 - wty) + bot * wty

    v00 = sample_resized(y0, x0)
    v01 = sample_resized(y0, x1)
    v10 = sample_resized(y1, x0)
    v11 = sample_resized(y1, x1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return (top * (1 - ty) + bot * ty).astype(feat.dtype)
