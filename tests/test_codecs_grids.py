"""Round-trip and oracle tests for codecs (.dist/h5/obj) and grid builders."""
import numpy as np
import jax.numpy as jnp
import pytest

from disn_tpu.core import codecs, grids


def test_dist_roundtrip(tmp_path):
    res = 8
    rng = np.random.default_rng(0)
    vals = rng.normal(size=((res + 1) ** 3,)).astype(np.float32)
    params = np.array([-1, -1, -1, 1, 1, 1], dtype=np.float64)
    p = str(tmp_path / "t.dist")
    codecs.write_dist(p, res, params, vals)
    df = codecs.read_dist(p, expect_res=res)
    np.testing.assert_allclose(df.params, params.astype(np.float32))
    np.testing.assert_allclose(df.values.reshape(-1), vals)
    # header layout: 3 int32 + 6 float64 + N float32
    import os
    assert os.path.getsize(p) == 12 + 48 + 4 * vals.size


def test_dist_header_validation(tmp_path):
    p = str(tmp_path / "bad.dist")
    codecs.write_dist(p, 4, np.zeros(6), np.zeros((5 ** 3,), np.float32))
    with pytest.raises(ValueError):
        codecs.read_dist(p, expect_res=8)


def test_sdf_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(100, 4)).astype(np.float32)
    p = str(tmp_path / "obj" / "ori_sample.h5")
    codecs.write_sdf_h5(p, samples, np.array([0, 0, 0, 1.0]),
                        np.array([-1, -1, -1, 1, 1, 1.0]))
    s = codecs.read_sdf_h5(p)
    np.testing.assert_allclose(s.sample_pt, samples[:, :3])
    np.testing.assert_allclose(s.sample_sdf, samples[:, 3])
    assert s.norm_params.shape == (4,) and s.sdf_params.shape == (6,)


def test_view_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    rec = codecs.ViewRecord(
        img_arr=rng.integers(0, 255, size=(137, 137, 4)).astype(np.uint8),
        trans_mat=rng.normal(size=(4, 3)).astype(np.float32),
        K=rng.normal(size=(3, 3)).astype(np.float32),
        RT=rng.normal(size=(3, 4)).astype(np.float32),
        obj_rot_mat=rng.normal(size=(3, 3)).astype(np.float32),
        regress_mat=rng.normal(size=(4, 3)).astype(np.float32),
    )
    p = str(tmp_path / "v" / "00.h5")
    codecs.write_view_h5(p, rec)
    got = codecs.read_view_h5(p)
    np.testing.assert_array_equal(got.img_arr, rec.img_arr)
    np.testing.assert_allclose(got.trans_mat, rec.trans_mat)


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = str(tmp_path / "m.obj")
    codecs.write_obj(p, verts, faces)
    v, f = codecs.read_obj(p)
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(f, faces)


def test_dense_grid_matches_reference_order():
    """Reference: meshgrid(z,y,x,indexing='ij') then concat (x,y,z)
    (test/create_sdf.py:243-258) => flat order x fastest."""
    params = np.array([-1, -2, -3, 1, 2, 3], dtype=np.float32)
    res = 5
    x_ = np.linspace(params[0], params[3], num=res)
    y_ = np.linspace(params[1], params[4], num=res)
    z_ = np.linspace(params[2], params[5], num=res)
    z, y, x = np.meshgrid(z_, y_, x_, indexing="ij")
    want = np.concatenate([a[..., None] for a in (x, y, z)], axis=3).reshape(-1, 3)

    got_np = grids.dense_grid_np(params, res)
    np.testing.assert_allclose(got_np, want, rtol=1e-6)

    got_dev = np.asarray(grids.dense_grid(jnp.asarray(params), res))
    np.testing.assert_allclose(got_dev, want, rtol=1e-5, atol=1e-6)


def test_grid_block_matches_dense():
    params = np.array([-1.2, -1, -0.8, 1.2, 1, 0.8], dtype=np.float32)
    res = 9
    full = grids.dense_grid_np(params, res)
    blk = np.asarray(grids.grid_block(jnp.asarray(params), res,
                                      jnp.int32(100), 50))
    np.testing.assert_allclose(blk, full[100:150], rtol=1e-5, atol=1e-6)


def test_trilinear_sample_matches_scipy():
    from scipy.interpolate import RegularGridInterpolator
    rng = np.random.default_rng(3)
    R = 7
    params = np.array([-1, -1, -1, 1, 1, 1], dtype=np.float32)
    vol = rng.normal(size=(R, R, R)).astype(np.float32)
    x = np.linspace(params[0], params[3], R)
    interp = RegularGridInterpolator((x, x, x), vol)  # (z,y,x) axes
    pts = rng.uniform(-0.99, 0.99, size=(40, 3)).astype(np.float32)
    want = interp(pts[:, ::-1])  # scipy wants (z,y,x) query order
    got = np.asarray(grids.trilinear_sample(jnp.asarray(vol),
                                            jnp.asarray(params),
                                            jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
