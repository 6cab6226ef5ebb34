"""Native distance-field generator tests: analytic oracles on meshes
extracted from known SDFs, sign correctness, CLI byte-format round trip."""
import os
import subprocess

import numpy as np
import pytest

from disn_tpu import native
from disn_tpu.core import codecs
from disn_tpu.data import synthetic
from disn_tpu.ops import marching

PARAMS = np.array([-1, -1, -1, 1, 1, 1], np.float32)


@pytest.fixture(scope="module")
def sphere_mesh():
    R = 65
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32)
    return marching.extract_mesh(vol, PARAMS)


def test_distance_field_sphere(sphere_mesh):
    verts, faces = sphere_mesh
    res = 32
    bbox = np.array([-1, -1, -1, 1, 1, 1], np.float64)
    vol = native.compute_distance_field(verts, faces, res, bbox)
    assert vol.shape == (33, 33, 33)
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    want = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1))
    # mesh is a 64-cell discretization of the sphere: tolerance ~ mesh error
    assert np.abs(vol - want).max() < 0.06
    # signs exactly right away from the surface
    far = np.abs(want) > 0.08
    assert (np.sign(vol[far]) == np.sign(want[far])).all()


def test_distance_field_box():
    R = 49
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = synthetic.sdf_box(np.stack([xx, yy, zz], -1)).astype(np.float32)
    verts, faces = marching.extract_mesh(vol, PARAMS)
    out = native.compute_distance_field(
        verts, faces, 24, np.array([-1, -1, -1, 1, 1, 1], np.float64))
    lin2 = np.linspace(-1, 1, 25, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin2, lin2, lin2, indexing="ij")
    want = synthetic.sdf_box(np.stack([xx, yy, zz], -1))
    # outside the box the true distance >= our sampled sdf; inside, the
    # analytic box "sdf" underestimates distance at edges — compare where
    # both are exact (faces region)
    err = np.abs(out - want)
    assert np.median(err) < 0.03
    far = np.abs(want) > 0.1
    assert (np.sign(out[far]) == np.sign(want[far])).mean() > 0.999


def test_cli_dist_format(sphere_mesh, tmp_path):
    verts, faces = sphere_mesh
    obj = str(tmp_path / "m.obj")
    codecs.write_obj(obj, verts, faces)
    exe = os.path.join(os.path.dirname(native._NATIVE_DIR), "native",
                       "distfield")
    subprocess.run(["make", "-C", native._NATIVE_DIR, "distfield"],
                   check=True, capture_output=True)
    out = str(tmp_path / "m.dist")
    subprocess.run([exe, obj, "16", "1.2", out], check=True)
    df = codecs.read_dist(out, expect_res=16)
    assert df.values.shape == (17, 17, 17)
    # center of the sphere is inside
    assert df.values[8, 8, 8] < 0
    # corners outside
    assert df.values[0, 0, 0] > 0


def test_banded_matches_exact_in_band(sphere_mesh):
    verts, faces = sphere_mesh
    bbox = np.array([-1, -1, -1, 1, 1, 1], np.float64)
    exact = native.compute_distance_field(verts, faces, 32, bbox)
    banded = native.compute_distance_field(verts, faces, 32, bbox, band=0.1)
    band_mask = np.abs(exact) < 0.1
    np.testing.assert_allclose(banded[band_mask], exact[band_mask],
                               atol=1e-5)
    # signs exact everywhere (parity pass is always full-resolution)
    assert (np.sign(banded) == np.sign(exact)).all()
    # far field stays a sane distance approximation
    far = np.abs(exact) > 0.3
    assert np.abs(banded[far] - exact[far]).max() < 0.06


def test_banded_anisotropic_bbox(sphere_mesh):
    """Band margin must use the full anisotropic cell diagonal: in-band
    values stay exact under a stretched bbox."""
    verts, faces = sphere_mesh
    bbox = np.array([-1, -1, -2, 1, 1, 2], np.float64)
    exact = native.compute_distance_field(verts, faces, 32, bbox)
    banded = native.compute_distance_field(verts, faces, 32, bbox, band=0.1)
    band_mask = np.abs(exact) < 0.1
    np.testing.assert_allclose(banded[band_mask], exact[band_mask], atol=1e-5)
    assert (np.sign(banded) == np.sign(exact)).all()


def test_obj_relative_and_invalid_indices(tmp_path):
    """CLI OBJ loader: negative (relative) indices resolve per the spec;
    out-of-range faces are skipped instead of read out of bounds."""
    import subprocess
    obj = str(tmp_path / "rel.obj")
    with open(obj, "w") as f:
        # a small double tetra around the origin using relative indices
        f.write("v 0.5 0 0\nv -0.5 0.4 0\nv -0.5 -0.4 0\nv 0 0 0.6\n"
                "v 0 0 -0.6\n")
        f.write("f -5 -4 -3\n")          # relative: verts 1 2 3
        f.write("f 1 2 4\nf 2 3 4\nf 3 1 4\n")
        f.write("f 1 3 5\nf 3 2 5\nf 2 1 5\n")
        f.write("f 1 2 99\n")            # out of range: must be skipped
    subprocess.run(["make", "-C", native._NATIVE_DIR, "distfield"],
                   check=True, capture_output=True)
    exe = native._NATIVE_DIR + "/distfield"
    out = str(tmp_path / "rel.dist")
    subprocess.run([exe, obj, "16", "1.3", out], check=True)
    df = codecs.read_dist(out, expect_res=16)
    # the exact center lies ON the internal z=0 triangle (distance -0.0);
    # check a strictly interior point just above it
    assert df.values[9, 8, 8] < 0        # inside the upper tetra
    assert df.values[0, 0, 0] > 0


def test_format_obj_matches_python_writer(tmp_path):
    """The C OBJ formatter produces the same mesh (parsed back) as the
    pure-python writer, including negatives, tiny and large magnitudes."""
    import numpy as np
    from disn_tpu import native
    from disn_tpu.core import codecs

    rng = np.random.RandomState(0)
    verts = np.concatenate([
        rng.randn(500, 3).astype(np.float32) * 3.0,
        np.array([[0, -0, 1e-7], [-1.9999995, 123.4567, -0.0000005]],
                 np.float32),
    ])
    faces = rng.randint(0, len(verts), size=(300, 3)).astype(np.int32)
    data = native.format_obj(verts, faces)
    p_native = tmp_path / "n.obj"
    p_native.write_bytes(data)
    v2, f2 = codecs.read_obj(str(p_native))
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    # write_obj routes big meshes through the native path transparently
    big_v = rng.randn(5000, 3).astype(np.float32)
    big_f = rng.randint(0, 5000, size=(9000, 3)).astype(np.int32)
    p_big = tmp_path / "big.obj"
    codecs.write_obj(str(p_big), big_v, big_f)
    v3, f3 = codecs.read_obj(str(p_big))
    np.testing.assert_allclose(v3, big_v, atol=1e-6)
    np.testing.assert_array_equal(f3, big_f)


def test_parse_obj_matches_python_reader(tmp_path):
    """The C OBJ parser (codecs.read_obj's big-file fast path) is
    BIT-identical to the pure-python line loop: quads and polygons
    fan-triangulate the same way, v/vt/vn face tokens take the first
    index, exponents and fixed-point floats round identically (u64/10^k
    is the correctly-rounded double, the same value float() produces,
    narrowed to f32 the same way), and non-v/f lines are ignored."""
    import numpy as np
    from disn_tpu import native
    from disn_tpu.core import codecs

    obj = (
        "# header comment\r\n"
        "v 0.5 -1.25e-3 3.0\n"
        "v 1 2 3\r\n"
        "vn 9 9 9\n"
        "vt 0.5 0.5\n"
        "v -0.001 4.5E2 -7\n"
        "v 0 0 1\n"
        "v 2 2 2\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"
        "f 1 2 5\n"
        "f 3//2 4 5 1 2\n"
        "s off\n"
        "usemtl none\n"
    )

    def py_parse(text):
        verts, faces = [], []
        for line in text.splitlines():
            if line.startswith("v "):
                p = line.split()
                verts.append([float(p[1]), float(p[2]), float(p[3])])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
        return (np.asarray(verts, np.float32),
                np.asarray(faces, np.int32).reshape(-1, 3))

    nv_, nf_ = native.parse_obj(obj.encode())
    pv, pf = py_parse(obj)
    np.testing.assert_array_equal(nv_, pv)
    np.testing.assert_array_equal(nf_, pf)

    # a >64KB file exercises read_obj's native fast path end to end; wide
    # magnitude spread exercises the fixed-point fast path + strtod slow
    # path; bit parity with the python loop on the identical bytes
    rng = np.random.RandomState(1)
    verts = (rng.randn(3000, 3) * np.exp(rng.randn(3000, 1) * 4)
             ).astype(np.float32)
    faces = rng.randint(0, 3000, size=(6000, 3)).astype(np.int32)
    p = tmp_path / "big.obj"
    codecs.write_obj(str(p), verts, faces)
    assert p.stat().st_size > (1 << 16)
    v2, f2 = codecs.read_obj(str(p))
    pv2, pf2 = py_parse(p.read_text())
    np.testing.assert_array_equal(v2, pv2)
    np.testing.assert_array_equal(f2, pf2)
    np.testing.assert_array_equal(f2, faces)
