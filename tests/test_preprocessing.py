"""Preprocessing + postprocessing tests: normalization, stratified bands,
end-to-end object generation against analytic SDFs, mesh cleaning."""
import numpy as np
import pytest

from disn_tpu.core import codecs
from disn_tpu.data import synthetic
from disn_tpu.ops import marching
from disn_tpu.postprocessing import clean_small_parts, connected_components
from disn_tpu.preprocessing import sdf_gen

PARAMS = np.array([-1, -1, -1, 1, 1, 1], np.float32)


def sphere_mesh(R=49, r=0.6):
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1), r=r)
    return marching.extract_mesh(vol.astype(np.float32), PARAMS)


def test_normalize_mesh():
    verts, faces = sphere_mesh()
    shifted = verts * 3.0 + np.array([1.0, -2.0, 0.5], np.float32)
    norm, centroid, m, surf = sdf_gen.normalize_mesh(shifted, faces)
    np.testing.assert_allclose(centroid, [1.0, -2.0, 0.5], atol=0.02)
    assert m == pytest.approx(1.8, rel=0.02)  # 0.6 * 3
    assert np.abs(np.linalg.norm(norm, axis=1) - 1.0).max() < 0.05
    assert np.abs(np.linalg.norm(surf, axis=1) - 1.0).max() < 0.05


def test_stratified_bands_within_bandwidth():
    rng = np.random.RandomState(0)
    res1 = 129  # dense enough that every band has >= quota candidates
    lin = np.linspace(-1, 1, res1, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32)
    s = sdf_gen.stratified_sample_grid(vol, PARAMS, 4096, 0.1, 0.003, rng)
    assert len(s) == 4096
    dis = s[:, 3] - 0.003
    assert (np.abs(dis) <= 0.1 + 1e-6).all()
    # quotas: each band ~25% (sphere has plenty of candidates per band)
    for lo, hi in [(-0.1, -0.03), (-0.03, 0), (0, 0.03), (0.03, 0.1)]:
        frac = ((dis >= lo) & (dis < hi)).mean()
        assert frac == pytest.approx(0.25, abs=0.02)
    # stored values match the analytic sdf at the stored points
    np.testing.assert_allclose(
        s[:, 3], synthetic.sdf_sphere(s[:, :3]), atol=1e-5)


def test_generate_object_end_to_end(tmp_path):
    verts, faces = sphere_mesh()
    out = sdf_gen.generate_object(
        verts * 2.0, faces, str(tmp_path / "obj"), cat_id="03001627",
        sdf_res=32, num_sample=2048, full_grid_reduce=4, seed=1)
    assert not out["skipped"]
    rec = codecs.read_sdf_h5(str(tmp_path / "obj" / "ori_sample.h5"))
    # normalization: sphere scaled x2 -> m ~ 1.2, centroid ~ 0
    assert rec.norm_params[3] == pytest.approx(1.2, rel=0.03)
    # sampled sdf values near the true sdf of the normalized sphere (r=0.5
    # after unit-sphere normalization of the r=0.6 sphere... r/m with
    # verts*2: radius 1.2, m=1.2 -> normalized radius 1.0)
    r = np.linalg.norm(rec.sample_pt, axis=1)
    np.testing.assert_allclose(rec.sample_sdf, r - 1.0, atol=0.06)
    # GT mesh exists and is sane
    mv, mf = codecs.read_obj(str(tmp_path / "obj" / "isosurf.obj"))
    assert len(mf) > 100
    assert np.abs(np.linalg.norm(mv, axis=1) - 1.0).max() < 0.1
    # full-grid variant: 9^3 regular values
    grid = codecs.read_sdf_h5(str(tmp_path / "obj" / "ori_sample_grid.h5"))
    assert grid.sample_pt is None
    assert grid.sample_sdf.shape[0] == 9 ** 3
    # idempotent skip
    again = sdf_gen.generate_object(verts, faces, str(tmp_path / "obj"))
    assert again["skipped"]


def test_clean_small_parts():
    # two spheres: big at origin, small far away
    v1, f1 = sphere_mesh(R=25, r=0.6)
    v2, f2 = sphere_mesh(R=9, r=0.3)
    v2 = v2 * 0.5 + np.array([2.0, 0, 0], np.float32)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)]).astype(np.int32)
    labels = connected_components(len(verts), faces)
    assert len(np.unique(labels)) == 2
    cv, cf = clean_small_parts(verts, faces)
    # far small component dropped
    assert len(cv) == len(v1)
    assert len(cf) == len(f1)
    assert np.abs(cv).max() < 1.0


def test_insideout_flip(tmp_path):
    verts, faces = sphere_mesh()
    # inverted sphere: flip face winding -> parity sign unaffected (parity
    # only counts crossings), so emulate inversion via category + an
    # inverted field check instead: cars with sdf(center) > 0 are flagged
    assert not sdf_gen.check_insideout("03001627", -np.ones((3, 3, 3)))
    assert sdf_gen.check_insideout("02958343", np.ones((3, 3, 3)))
    assert not sdf_gen.check_insideout("02958343", -np.ones((3, 3, 3)))


def test_preprocess_cli_end_to_end(tmp_path):
    """preprocess-sdf and preprocess-img CLIs over a real mesh + rendering."""
    from PIL import Image
    from disn_tpu import cli
    from disn_tpu.data import synthetic

    # input mesh tree
    verts, faces = sphere_mesh(R=33)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    codecs.write_obj(str(mesh_dir / "sph.obj"), verts, faces)

    out_dir = tmp_path / "sdf"
    cli.main(["preprocess-sdf", "--pattern", str(mesh_dir / "*.obj"),
              "--out-dir", str(out_dir), "--cat-id", "99999999",
              "--res", "32", "--num-sample", "512"])
    rec = codecs.read_sdf_h5(str(out_dir / "sph" / "ori_sample.h5"))
    assert rec.sample_pt is not None and len(rec.sample_sdf) > 0
    assert (tmp_path / "sdf" / "sph" / "isosurf.obj").exists()

    # rendered view + metadata -> view h5
    img8, _ = synthetic.render_view(synthetic.sdf_sphere, 30.0, 20.0, 0.85)
    png_dir = tmp_path / "renders"
    png_dir.mkdir()
    Image.fromarray(img8, "RGBA").save(str(png_dir / "00.png"))
    meta = tmp_path / "rendering_metadata.txt"
    meta.write_text("30.0 20.0 0.0 0.85 35\n")
    view_dir = tmp_path / "views"
    cli.main(["preprocess-img", "--pattern", str(png_dir / "*.png"),
              "--metadata", str(meta),
              "--sdf-h5", str(out_dir / "sph" / "ori_sample.h5"),
              "--out-dir", str(view_dir)])
    view = codecs.read_view_h5(str(view_dir / "00.h5"))
    assert view.img_arr.shape == (137, 137, 4)
    assert view.trans_mat.shape == (4, 3)
    # camera consistency: normalized-mesh surface points project into the
    # rendered alpha region (same invariant as the data-pipeline test)
    import jax.numpy as jnp
    from disn_tpu.core import camera
    norm = (verts - rec.norm_params[:3]) / rec.norm_params[3]
    px = np.asarray(camera.project_points(
        jnp.asarray(norm[None, ::7]), jnp.asarray(view.trans_mat[None])))[0]
    alpha = view.img_arr[:, :, 3] > 0
    from scipy import ndimage
    grown = ndimage.binary_dilation(alpha, iterations=3)
    xi = np.clip(np.round(px[:, 0]).astype(int), 0, 136)
    yi = np.clip(np.round(px[:, 1]).astype(int), 0, 136)
    assert grown[yi, xi].mean() > 0.9
