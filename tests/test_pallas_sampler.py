"""Pallas tiled sampler tests (interpret mode on CPU): exact equivalence with
the reference jnp sampling path when footprints fit the tile."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.ops import image as image_ops
from disn_tpu.ops import pallas_sampler as ps


def grouped_coords(G=16, K=64, spread=2.5, seed=0, lo=5.0, hi=130.0):
    """[G,K,2] coords in 137-space, each group within a small footprint."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(lo, hi, (G, 1, 2))
    return jnp.asarray((centers + rng.uniform(-spread, spread, (G, K, 2)))
                       .astype(np.float32))


@pytest.mark.parametrize("hw,c,tile", [((28, 28), 32, 16), ((56, 56), 16, 16)])
def test_tile_sample_matches_native(hw, c, tile):
    rng = np.random.RandomState(1)
    fmap = jnp.asarray(rng.rand(1, hw[0], hw[1], c).astype(np.float32))
    px = grouped_coords()
    got = ps.sample_multiscale({"m": fmap}, px, ("m",), tiles={"m": tile},
                               interpret=True)
    want = image_ops.sample_native(fmap, px.reshape(1, -1, 2), 137, 137)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, c),
                               np.asarray(want)[0], rtol=1e-5, atol=1e-5)


def test_tile_sample_edge_coords():
    """Coords at the image border: projector clamps to [0,136]; tile origins
    clamp so taps stay inside."""
    rng = np.random.RandomState(2)
    fmap = jnp.asarray(rng.rand(1, 14, 14, 16).astype(np.float32))
    K = 64
    edge = np.zeros((4, K, 2), np.float32)
    edge[0] = 0.0                     # top-left corner
    edge[1] = 136.0                   # bottom-right corner
    edge[2, :, 0] = 136.0             # right edge, y varies in a band
    edge[2, :, 1] = np.linspace(100, 104, K)
    edge[3, :, 0] = np.linspace(0, 3, K)
    edge[3, :, 1] = 0.0
    px = jnp.asarray(edge)
    got = ps.sample_multiscale({"m": fmap}, px, ("m",), tiles={"m": 16},
                               interpret=True)
    want = image_ops.sample_native(fmap, px.reshape(1, -1, 2), 137, 137)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 16),
                               np.asarray(want)[0], rtol=1e-5, atol=1e-5)


def test_multiscale_concat_matches_model_path():
    """Full 5-scale grouped sampling == disn.sample_local_features(native)."""
    from disn_tpu.config import Config
    from disn_tpu.models import disn, vgg

    cfg = Config(num_classes=16, width_mult=0.125, sampling="native")
    params = disn.init(cfg, jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 137, 137, 3))
    _, endpoints = disn.encode(params, img, cfg)
    px = grouped_coords(G=8, K=64)
    got = ps.sample_multiscale(endpoints, px, vgg.ENDPOINTS, interpret=True)
    want = disn.sample_local_features(endpoints, px.reshape(1, -1, 2), cfg)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, got.shape[-1]),
                               np.asarray(want)[0], rtol=1e-4, atol=1e-4)


def test_grid_cube_footprint_bound():
    """For the ShapeNet camera envelope, the projected footprint of a 4^3
    fine-grid cube (256^3 grid) stays within every scale's tile budget."""
    from disn_tpu.core import camera

    worst = {name: 0.0 for name in ps.DEFAULT_TILES}
    scales = {"conv1_2": 224, "conv2_2": 112, "conv3_3": 56,
              "conv4_3": 28, "conv5_3": 14}
    for az in (0.0, 45.0):
        for el in (10.0, 35.0):
            for dist in (0.65, 1.0):
                trans, _, _, _ = camera.view_params_to_trans_mat(
                    az, el, dist, np.zeros(3), 1.0)
                # a 4-cell cube near the close corner of the bbox (largest
                # apparent size)
                base = np.array([-0.9, -0.9, -0.9])
                cube = base + np.stack(np.meshgrid(
                    *[np.linspace(0, 4 * 2 / 256, 5)] * 3,
                    indexing="ij"), -1).reshape(-1, 3)
                px = np.asarray(camera.project_points(
                    jnp.asarray(cube[None], jnp.float32),
                    jnp.asarray(trans[None])))[0]
                ext137 = (px.max(0) - px.min(0)).max()
                for name, s in scales.items():
                    worst[name] = max(worst[name], ext137 * s / 137)
    # usable span = tile - 8 (x origins align down to 8), minus bilinear tap
    for name, tile in ps.DEFAULT_TILES.items():
        assert worst[name] <= tile - 9, (name, worst[name], tile)
