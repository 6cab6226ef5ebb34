"""Cross-validate native/distfield.cpp against the reference's prebuilt
Vega `computeDistanceField` binary (the closed-source tool DISN's
preprocessing shells out to — create_point_sdf_grid.py:200-210).

The binary links 2007-era TBB (libtbb.so.2) and GLU/glut, none present on
this host; `make -C native refshim` builds a serial TBB-2018 ABI shim
(native/tbb2018_serial_shim.cpp) + empty GL stubs that let it run. Both
tools then compute 65^3 signed fields over IDENTICAL bboxes for three
analytic watertight meshes (UV sphere, UV torus, octahedron) and the
fields are diffed point-by-point:

  * Vega -m 0 (BASIC: exact distance, pseudonormal sign) vs ours (exact
    distance, 3-axis parity sign): measured agreement is ONE FLOAT ULP on
    99.9% of points; the remainder are sign flips at points grazing the
    faceted surface (|d| < ~6% of a grid cell) where the two sign
    conventions legitimately disagree — magnitudes still match.
  * Vega -m 1 (POLYGONSOUP — the DISN protocol mode): reconstructs an
    offset surface via marching cubes at iso 2*cell and re-measures, so it
    deviates from the exact field by up to ~3e-3 (mean ~5e-5). That is the
    reference protocol's own approximation error, reported here for the
    record; our exact field is strictly closer to ground truth.

Asserted bounds (exit 1 on violation): same-sign |diff| <= 5e-7,
sign-mismatch fraction <= 0.2% with every mismatch within 10% of a cell
of the surface, and -m1 mean |diff| <= 5e-4.

Usage: python scripts/crosscheck_distfield.py  (CPU-only, ~30 s)
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
REF_BIN = "/root/reference/isosurface/computeDistanceField"
SHIM_DIR = f"{REPO}/native/build/refshim"
RES = 64


def write_obj(path: str, v: np.ndarray, f: np.ndarray) -> None:
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]:.7f} {p[1]:.7f} {p[2]:.7f}\n")
        for t in f:
            fh.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def uv_sphere(r=0.6, nu=48, nv=96):
    verts = [(0.0, 0.0, r)]
    faces = []
    for i in range(1, nu):
        th = np.pi * i / nu
        for j in range(nv):
            ph = 2 * np.pi * j / nv
            verts.append((r * np.sin(th) * np.cos(ph),
                          r * np.sin(th) * np.sin(ph), r * np.cos(th)))
    verts.append((0.0, 0.0, -r))
    last = len(verts) - 1
    for j in range(nv):
        faces.append((0, 1 + j, 1 + (j + 1) % nv))
    for i in range(nu - 2):
        a, b = 1 + i * nv, 1 + (i + 1) * nv
        for j in range(nv):
            j2 = (j + 1) % nv
            faces.append((a + j, b + j, b + j2))
            faces.append((a + j, b + j2, a + j2))
    a = 1 + (nu - 2) * nv
    for j in range(nv):
        faces.append((last, a + (j + 1) % nv, a + j))
    return np.array(verts), np.array(faces, np.int32)


def uv_torus(R0=0.55, r0=0.22, nu=96, nv=48):
    verts, faces = [], []
    for i in range(nu):
        u = 2 * np.pi * i / nu
        for j in range(nv):
            v = 2 * np.pi * j / nv
            verts.append(((R0 + r0 * np.cos(v)) * np.cos(u),
                          (R0 + r0 * np.cos(v)) * np.sin(u),
                          r0 * np.sin(v)))
    for i in range(nu):
        i2 = (i + 1) % nu
        for j in range(nv):
            j2 = (j + 1) % nv
            a, b = i * nv + j, i2 * nv + j
            c, d = i2 * nv + j2, i * nv + j2
            faces.append((a, b, c))
            faces.append((a, c, d))
    return np.array(verts), np.array(faces, np.int32)


def octahedron(s=0.65):
    v = np.array([[s, 0, 0], [-s, 0, 0], [0, s, 0], [0, -s, 0],
                  [0, 0, s], [0, 0, -s]], float)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return v, f


def run_ref(obj: str, half: float, out: str, mode: int) -> None:
    # NB: the Vega option parser rejects -o values containing '/', so run
    # from the output directory with bare filenames
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = f"{SHIM_DIR}:/root/reference/isosurface"
    bbox = f"-b-{half},-{half},-{half},{half},{half},{half}"
    cwd = os.path.dirname(out)
    subprocess.run([REF_BIN, os.path.basename(obj), str(RES), str(RES),
                    str(RES), "-s", "-m", str(mode), bbox, "-o",
                    os.path.basename(out)],
                   env=env, cwd=cwd, check=True, capture_output=True,
                   timeout=570)


def main() -> int:
    subprocess.run(["make", "-C", f"{REPO}/native", "refshim", "distfield"],
                   check=True, capture_output=True)
    from disn_tpu.core.codecs import read_dist

    meshes = {"sphere": (uv_sphere(), 0.72), "torus": (uv_torus(), 0.924),
              "octa": (octahedron(), 0.78)}
    ok = True
    with tempfile.TemporaryDirectory() as td:
        for name, ((v, f), half) in meshes.items():
            obj = f"{td}/{name}.obj"
            write_obj(obj, v, f)
            subprocess.run([f"{REPO}/native/distfield", obj, str(RES),
                            "1.2", f"{td}/{name}_ours.dist", "3", "0", "0"],
                           check=True, capture_output=True, timeout=570)
            run_ref(obj, half, f"{td}/{name}_m0.dist", 0)
            run_ref(obj, half, f"{td}/{name}_m1.dist", 1)

            ours = read_dist(f"{td}/{name}_ours.dist")
            m0 = read_dist(f"{td}/{name}_m0.dist")
            m1 = read_dist(f"{td}/{name}_m1.dist")
            assert np.allclose(ours.params, m0.params, atol=1e-6), name
            a, b, c = ours.values, m0.values, m1.values
            cell = 2 * half / RES

            mism = np.sign(a) != np.sign(b)
            same = ~mism
            d0 = float(np.abs(a - b)[same].max())
            frac = float(mism.mean())
            graze = float(np.abs(a[mism]).max()) if mism.any() else 0.0
            d1 = float(np.abs(a - c).mean())
            line_ok = (d0 <= 5e-7 and frac <= 2e-3 and graze <= 0.1 * cell
                       and d1 <= 5e-4)
            ok &= line_ok
            print(f"{name:7s} vs -m0: same-sign max {d0:.2e} "
                  f"({same.mean() * 100:.2f}% of pts), sign flips "
                  f"{int(mism.sum())} all within {graze / cell * 100:.1f}% "
                  f"of a cell | vs -m1 (DISN protocol): mean {d1:.1e} "
                  f"max {float(np.abs(a - c).max()):.1e} "
                  f"| {'OK' if line_ok else 'FAIL'}", flush=True)
    print("crosscheck_distfield:", "ALL OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
