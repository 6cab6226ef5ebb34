"""Pin TF1-exact semantics against REAL TensorFlow (not just numpy oracles).

SURVEY.md "hard parts" #1: bilinear-resize and slim-VGG conv semantics must
match TF1 exactly or local features shift by ~a pixel. The numpy oracles in
test_image_ops.py encode our READING of TF's formulas; these tests check the
reading against TensorFlow itself (available in the dev image):

- resize_bilinear vs tf.compat.v1.image.resize_bilinear
  (align_corners=False, half_pixel_centers=False — the TF1 default the
  reference runs under, model_normalization.py:65-73, :171-185)
- the full VGG-16 forward vs a TF1 graph built exactly like slim's vgg_16
  (models/CNN/vgg.py:144-240: SAME 3x3 convs + relu, VALID 2x2/2 pools,
  fc6 7x7 VALID, fc7/fc8 1x1, fc8 linear) sharing OUR weights.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from disn_tpu.ops import image as image_ops  # noqa: E402


def _tf1():
    import tensorflow.compat.v1 as tf1
    tf1.disable_eager_execution()
    return tf1


@pytest.mark.parametrize("in_hw,out_hw", [((137, 137), (224, 224)),
                                          ((224, 224), (137, 137)),
                                          ((7, 9), (13, 5))])
def test_resize_bilinear_matches_real_tf(in_hw, out_hw):
    tf1 = _tf1()
    rng = np.random.RandomState(0)
    img = rng.rand(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(image_ops.resize_bilinear(jnp.asarray(img), *out_hw))
    g = tf1.Graph()
    with g.as_default():
        out = tf1.image.resize_bilinear(tf1.constant(img), out_hw,
                                        align_corners=False,
                                        half_pixel_centers=False)
        with tf1.Session() as sess:
            want = sess.run(out)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_vgg_forward_matches_real_tf_slim_graph():
    from disn_tpu.models import vgg

    tf1 = _tf1()
    width_mult, num_classes = 0.125, 32
    params = vgg.init(jax.random.PRNGKey(0), num_classes=num_classes,
                      width_mult=width_mult)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    rng = np.random.RandomState(1)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)

    emb, eps = vgg.apply(params, jnp.asarray(img))
    emb = np.asarray(emb)

    g = tf1.Graph()
    with g.as_default():
        x = tf1.constant(img)
        tf_eps = {}
        # the slim stack, reference models/CNN/vgg.py:108-126
        for block, names, _ in vgg._CFG:
            for name in names:
                p = params_np[block][name]
                x = tf1.nn.relu(tf1.nn.conv2d(
                    x, p["weights"], strides=[1, 1, 1, 1], padding="SAME")
                    + p["biases"])
                tf_eps[name] = x
            x = tf1.nn.max_pool2d(x, ksize=2, strides=2, padding="VALID")
        x = tf1.nn.relu(tf1.nn.conv2d(
            x, params_np["fc6"]["weights"], strides=[1, 1, 1, 1],
            padding="VALID") + params_np["fc6"]["biases"])
        x = tf1.nn.relu(tf1.nn.conv2d(
            x, params_np["fc7"]["weights"], strides=[1, 1, 1, 1],
            padding="SAME") + params_np["fc7"]["biases"])
        x = tf1.nn.conv2d(x, params_np["fc8"]["weights"],
                          strides=[1, 1, 1, 1], padding="SAME") \
            + params_np["fc8"]["biases"]
        with tf1.Session() as sess:
            want_emb, want_eps = sess.run(
                (x, {k: tf_eps[k] for k in vgg.ENDPOINTS}))

    np.testing.assert_allclose(emb, want_emb.reshape(want_emb.shape[0], -1),
                               rtol=1e-4, atol=1e-4)
    for k in vgg.ENDPOINTS:
        np.testing.assert_allclose(np.asarray(eps[k]), want_eps[k],
                                   rtol=1e-4, atol=1e-4)


def test_preprocess_resize_path_matches_tf(tmp_path):
    """The exact 137->224 image path the model runs
    (model_normalization.py:65-73: resize_bilinear to 224)."""
    tf1 = _tf1()
    from disn_tpu.config import Config
    from disn_tpu.models import disn

    cfg = Config(num_classes=32, width_mult=0.125)
    rng = np.random.RandomState(2)
    img = rng.rand(1, 137, 137, 3).astype(np.float32)
    got = np.asarray(disn.preprocess_image(jnp.asarray(img), cfg))
    g = tf1.Graph()
    with g.as_default():
        out = tf1.image.resize_bilinear(tf1.constant(img), (224, 224),
                                        align_corners=False,
                                        half_pixel_centers=False)
        with tf1.Session() as sess:
            want = sess.run(out)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
