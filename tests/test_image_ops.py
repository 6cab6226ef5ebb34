"""Oracle tests for TF1-exact resize/resampler ops (disn_tpu/ops/image.py).

Numpy oracles implement the documented TF1 legacy kernels directly
(align_corners=False, half_pixel_centers=False)."""
import numpy as np
import jax.numpy as jnp

from disn_tpu.ops import image as im


def np_resize_bilinear_tf1(img, out_h, out_w):
    b, h, w, c = img.shape
    sy, sx = h / out_h, w / out_w
    out = np.zeros((b, out_h, out_w, c), dtype=np.float32)
    for oy in range(out_h):
        fy = oy * sy
        y0 = int(np.floor(fy)); y1 = min(y0 + 1, h - 1); ty = fy - y0
        for ox in range(out_w):
            fx = ox * sx
            x0 = int(np.floor(fx)); x1 = min(x0 + 1, w - 1); tx = fx - x0
            top = img[:, y0, x0] * (1 - tx) + img[:, y0, x1] * tx
            bot = img[:, y1, x0] * (1 - tx) + img[:, y1, x1] * tx
            out[:, oy, ox] = top * (1 - ty) + bot * ty
    return out


def np_resampler(data, coords):
    b, h, w, c = data.shape
    n = coords.shape[1]
    out = np.zeros((b, n, c), dtype=np.float32)
    for bi in range(b):
        for ni in range(n):
            x, y = coords[bi, ni]
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            tx, ty = x - x0, y - y0
            acc = np.zeros(c, np.float32)
            for dy, wy in ((0, 1 - ty), (1, ty)):
                for dx, wx in ((0, 1 - tx), (1, tx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        acc += wy * wx * data[bi, yy, xx]
            out[bi, ni] = acc
    return out


def test_resize_bilinear_upsample():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(img), 13, 17))
    want = np_resize_bilinear_tf1(img, 13, 17)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_downsample():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 224, 224, 2)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(img), 137, 137))
    want = np_resize_bilinear_tf1(img, 137, 137)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_bilinear_identity():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(img), 5, 5))
    np.testing.assert_allclose(got, img)


def test_resize_137_to_224_matches_oracle():
    # the exact resize used on input images (model_normalization.py:65-73)
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(1, 137, 137, 3)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(img), 224, 224))
    want = np_resize_bilinear_tf1(img, 224, 224)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest():
    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 137, 137, 1)).astype(np.float32)
    got = np.asarray(im.resize_nearest(jnp.asarray(img), 224, 224))
    iy = np.minimum((np.arange(224) * (137 / 224)).astype(np.int32), 136)
    want = img[:, iy][:, :, iy]
    np.testing.assert_allclose(got, want)


def test_resampler_matches_oracle():
    rng = np.random.default_rng(5)
    data = rng.normal(size=(2, 11, 13, 4)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(0, 12, size=(2, 50)), rng.uniform(0, 10, size=(2, 50))],
        axis=-1).astype(np.float32)
    got = np.asarray(im.resampler(jnp.asarray(data), jnp.asarray(coords)))
    want = np_resampler(data, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resampler_integer_coords_exact():
    rng = np.random.default_rng(6)
    data = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    coords = np.array([[[3.0, 5.0], [0.0, 0.0], [7.0, 7.0]]], dtype=np.float32)
    got = np.asarray(im.resampler(jnp.asarray(data), jnp.asarray(coords)))
    want = np.stack([data[0, 5, 3], data[0, 0, 0], data[0, 7, 7]])[None]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resize_then_sample_matches_materializing_path():
    """The fused 16-tap path must equal resize+resampler bit-for-bit-ish."""
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(2, 56, 56, 8)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(0, 136, size=(2, 64)), rng.uniform(0, 136, size=(2, 64))],
        axis=-1).astype(np.float32)
    fj, cj = jnp.asarray(feat), jnp.asarray(coords)
    resized = im.resize_bilinear(fj, 137, 137)
    want = np.asarray(im.resampler(resized, cj))
    got = np.asarray(im.resize_then_sample(fj, cj, 137, 137))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_then_sample_boundary():
    rng = np.random.default_rng(8)
    feat = rng.normal(size=(1, 14, 14, 3)).astype(np.float32)
    coords = np.array([[[136.0, 136.0], [0.0, 136.0], [136.0, 0.0],
                        [0.0, 0.0], [135.999, 135.999]]], dtype=np.float32)
    fj, cj = jnp.asarray(feat), jnp.asarray(coords)
    want = np.asarray(im.resampler(im.resize_bilinear(fj, 137, 137), cj))
    got = np.asarray(im.resize_then_sample(fj, cj, 137, 137))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_sampling_linear_reproduction():
    """Both sampling schemes reproduce globally-LINEAR feature maps exactly
    (every stage is an affine-combination of taps), so they must agree there;
    on general maps native is a different (chord-free) interpolation."""
    import jax.numpy as jnp
    import numpy as np
    from disn_tpu.ops import image as image_ops

    h = w = 28
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lin = (0.3 + 0.05 * xx - 0.02 * yy).astype(np.float32)[None, :, :, None]
    feat = jnp.asarray(lin)
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(2.0, 128.0, (1, 256, 2)).astype(np.float32))
    a = np.asarray(image_ops.resize_then_sample(feat, coords, 137, 137))
    b = np.asarray(image_ops.sample_native(feat, coords, 137, 137))
    # direct analytic evaluation at scaled source coords
    sx = np.asarray(coords)[0, :, 0] * (w / 137)
    sy = np.asarray(coords)[0, :, 1] * (h / 137)
    want = 0.3 + 0.05 * sx - 0.02 * sy
    np.testing.assert_allclose(b[0, :, 0], want, atol=1e-5)
    np.testing.assert_allclose(a[0, :, 0], want, atol=1e-5)


def test_native_sampling_statistically_close():
    """On random maps the two schemes differ only by sub-texel interpolation
    choices: tiny mean deviation, bounded max."""
    import jax.numpy as jnp
    import numpy as np
    from disn_tpu.ops import image as image_ops

    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.rand(1, 28, 28, 8).astype(np.float32))
    coords = jnp.asarray(rng.uniform(2.0, 128.0, (1, 2048, 2)).astype(np.float32))
    a = np.asarray(image_ops.resize_then_sample(feat, coords, 137, 137))
    b = np.asarray(image_ops.sample_native(feat, coords, 137, 137))
    diff = np.abs(a - b)
    assert diff.mean() < 0.02
    assert diff.max() < 0.3


def test_resampler_clamped_edges():
    import jax.numpy as jnp
    import numpy as np
    from disn_tpu.ops import image as image_ops

    data = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    coords = jnp.asarray([[[-1.0, 0.0], [5.0, 3.0], [1.5, 1.5]]], jnp.float32)
    out = np.asarray(image_ops.resampler_clamped(data, coords))[0, :, 0]
    assert out[0] == 0.0      # clamped to (0,0)
    assert out[1] == 15.0     # clamped to (3,3)
    assert out[2] == (5 + 6 + 9 + 10) / 4  # true bilinear interior
