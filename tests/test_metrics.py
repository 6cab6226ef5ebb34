"""Metric tests: numpy brute-force oracles for Chamfer, EMD sanity/mass
conservation, gradients, F-score formulas, voxel IoU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.eval import metrics
from disn_tpu.ops import voxelize


def clouds(b=2, n=64, m=48, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, n, 3).astype(np.float32)),
            jnp.asarray(rng.randn(b, m, 3).astype(np.float32)))


def test_nn_distance_oracle():
    x1, x2 = clouds()
    d1, i1, d2, i2 = metrics.nn_distance(x1, x2)
    a, b = np.asarray(x1), np.asarray(x2)
    full = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1), full.min(-1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), full.argmin(-1))
    np.testing.assert_allclose(np.asarray(d2), full.min(-2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2), full.argmin(-2))


def test_nn_distance_gradient():
    x1, x2 = clouds(b=1, n=16, m=16, seed=1)

    def loss(a, b):
        d1, _, d2, _ = metrics.nn_distance(a, b)
        return jnp.sum(d1) + jnp.sum(d2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(x1, x2)
    # numeric check on a few coordinates
    eps = 1e-3
    base = float(loss(x1, x2))
    for (i, j, k) in [(0, 3, 1), (0, 7, 2)]:
        xp = x1.at[i, j, k].add(eps)
        num = (float(loss(xp, x2)) - base) / eps
        assert abs(num - float(g1[i, j, k])) < 5e-2


def test_approx_match_mass_conservation():
    x1, x2 = clouds(b=1, n=128, m=128, seed=2)
    m = metrics.approx_match(x1, x2)  # [B,M,N]
    mm = np.asarray(m)[0]
    # doubly-stochastic up to auction tolerance: all mass transported
    np.testing.assert_allclose(mm.sum(axis=0), 1.0, atol=0.05)
    np.testing.assert_allclose(mm.sum(axis=1), 1.0, atol=0.05)
    assert (mm >= 0).all()


def test_emd_identical_clouds_near_zero():
    x1, _ = clouds(b=1, n=128, m=128, seed=3)
    m = metrics.approx_match(x1, x1)
    cost = float(metrics.match_cost(x1, x1, m)[0])
    # identity matching is optimal: near-diagonal mass, tiny cost
    assert cost < 0.05 * 128


def test_emd_translation_lower_bound():
    """EMD of a cloud vs its translate >= n * |t| is exact (all plans cost
    >= straight-line); auction should be within 10%."""
    x1, _ = clouds(b=1, n=64, m=64, seed=4)
    t = np.array([0.5, 0, 0], np.float32)
    x2 = x1 + jnp.asarray(t)
    m = metrics.approx_match(x1, x2)
    cost = float(metrics.match_cost(x1, x2, m)[0])
    assert cost >= 64 * 0.5 * 0.9
    assert cost <= 64 * 0.5 * 1.6


def test_match_cost_gradient():
    x1, x2 = clouds(b=1, n=12, m=12, seed=5)
    m = metrics.approx_match(x1, x2)

    def loss(a):
        return jnp.sum(metrics.match_cost(a, x2, m))

    g = jax.grad(loss)(x1)
    eps = 1e-3
    base = float(loss(x1))
    num = (float(loss(x1.at[0, 4, 0].add(eps))) - base) / eps
    assert abs(num - float(g[0, 4, 0])) < 5e-2


def test_chamfer_emd_protocol_scaling():
    x1, x2 = clouds(b=1, n=32, m=32, seed=6)
    out = metrics.chamfer_emd(x1, x2)
    d1, _, d2, _ = metrics.nn_distance(x1, x2)
    want_cd = (float(jnp.mean(d1)) + float(jnp.mean(d2))) * 1000.0
    np.testing.assert_allclose(float(out["cd"][0]), want_cd, rtol=1e-4)


def test_f_score_formula():
    # well-separated 3x3x3 lattice so each point's NN is its own offset twin
    g = np.stack(np.meshgrid(*[np.arange(3) * 0.5] * 3,
                             indexing="ij"), -1).reshape(1, 27, 3)
    pred = jnp.asarray(g.astype(np.float32))
    gt = pred + 0.05  # offset distance = 0.05*sqrt(3) ~ 0.0866
    out = metrics.f_score(pred, gt, np.array([0.05, 0.1], np.float32))
    # threshold 0.05 < offset distance -> zero precision/recall
    assert float(out["precision"][0, 0]) == 0.0
    assert float(out["f1"][1, 0]) == pytest.approx(1.0)


def test_voxelize_sphere_iou():
    from disn_tpu.data import synthetic
    from disn_tpu.ops import marching
    R = 33
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    m1 = marching.extract_mesh(
        synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32),
        params)
    m2 = marching.extract_mesh(
        synthetic.sdf_sphere(np.stack([xx, yy, zz], -1), r=0.55)
        .astype(np.float32), params)
    assert voxelize.iou_meshes(m1, m1, dim=64) == pytest.approx(1.0)
    iou_diff = voxelize.iou_meshes(m1, m2, dim=64)
    assert 0.0 < iou_diff < 0.35  # thin shells at different radii
    # solid IoU of nested spheres = volume ratio (0.55/0.6)^3 ~ 0.77
    solid = voxelize.iou_meshes(m1, m2, dim=64, solid=True)
    assert solid == pytest.approx((0.55 / 0.6) ** 3, abs=0.08)


def test_surface_sampling():
    from disn_tpu.data import synthetic
    from disn_tpu.ops import marching
    R = 33
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    verts, faces = marching.extract_mesh(
        synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32),
        params)
    pts = metrics.sample_mesh_surface(verts, faces, 2048)
    assert pts.shape == (2048, 3)
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 0.6).max() < 0.08
    vv = metrics.sample_mesh_vertices(verts, 512)
    assert vv.shape == (512, 3)


def test_device_voxelization_matches_host():
    from disn_tpu.data import synthetic
    from disn_tpu.ops import marching
    R = 33
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    m1 = marching.extract_mesh(
        synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32),
        params)
    m2 = marching.extract_mesh(
        synthetic.sdf_sphere(np.stack([xx, yy, zz], -1), r=0.55)
        .astype(np.float32), params)
    host = voxelize.iou_meshes(m1, m2, dim=48)
    dev = voxelize.iou_meshes_device(m1, m2, dim=48)
    # both are Monte-Carlo surface voxelizations; IoU must agree closely
    assert dev == pytest.approx(host, abs=0.05)
    assert voxelize.iou_meshes_device(m1, m1, dim=48) == pytest.approx(
        1.0, abs=0.02)
