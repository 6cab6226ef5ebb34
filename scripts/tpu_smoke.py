"""TPU kernel-numerics smoke test: fused Pallas decode + marching
extraction on REAL Mosaic vs their oracles.

The CI suite runs every kernel in interpreter mode on the CPU mesh
(tests/test_fused.py) — real-Mosaic numerics were previously exercised
only by benches whose outputs nobody asserts, so a Mosaic regression
(layout change, tiling bug, quantization drift) would surface as silent
bench drift. This script is the on-hardware assertion pass; run it
whenever the tunnel is up and before trusting new bench numbers.

Checks (all small shapes, compile-cached):
  1. fused Pallas cell decode (f32) vs XLA fold137 decode within
     0.5% of the field scale — includes escape-rescue cells (the fixture
     camera's w=0 plane). NOT exact on hardware: TPU f32 matmuls default
     to bf16-pass MXU decomposition, so the kernel and the XLA path round
     in different orders; the drift is set by internal ACTIVATION scale,
     not the (small) output scale — measured 0.31% of output scale on
     this fixture (CPU-interpreter tests pin true f32 exactness). The
     bound still catches layout/tiling bugs, which produce O(1) errors.
  2. fused decode in bf16 (production dtype) within 2% of the XLA bf16
     path (independent rounding orders; mirrors
     tests/test_fused.py::test_decode_cells_bf16_close_to_xla_bf16).
  3. device marching-tets triangle soup == marching_tets_np numpy oracle,
     same triangles in the same cell-scan order (the on-hardware twin of
     tests/test_marching.py::test_device_matches_numpy_oracle; oracle
     pattern of the reference's tf_nndistance_cpu.py:28-48).
  4. record-mode extraction on device -> host assembly reproduces the
     device two-pass owned-edge extractor exactly (faces identical, verts
     within the u16 edge-t quantization step).

Exit codes: 0 pass, 1 numeric mismatch (assertion), 3 TPU unreachable
(skipped — the probe is a bounded subprocess, pattern of
bench.tpu_reachable, so a dead axon tunnel cannot hang this script).

Usage: python scripts/tpu_smoke.py [--json OUT.json]
(--json writes the machine-readable verdict — the per-round artifact
proving this round's kernels matched their oracles on hardware.)
"""
from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import tpu_reachable  # noqa: E402  (bounded subprocess probe)


def check_fused_kernel() -> list[dict]:
    import jax
    import jax.numpy as jnp

    from disn_tpu.config import Config
    from disn_tpu.infer import dense, fused
    from disn_tpu.models import disn

    trans = np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]]).astype(
        np.float32)
    geom = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    fine_r, coarse_c = 49, 12

    rng = np.random.RandomState(0)
    cells = np.sort(rng.choice(coarse_c ** 3, 96, replace=False)
                    ).astype(np.int32)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                        (1, 137, 137, 3)), np.float32)

    results = []
    for dtype, tol in (("float32", 5e-3), ("bfloat16", 0.02)):
        cfg = Config(num_classes=32, width_mult=0.125, sdf_res=fine_r - 1,
                     compute_dtype=dtype, sampling="tf1")
        params = disn.init(cfg, jax.random.PRNGKey(0))
        prep = jax.jit(functools.partial(dense._prep, cfg=cfg,
                                         fold_local="137"))
        _, eps = prep(params, jnp.asarray(img))
        vals, esc_over = fused.decode_cells(
            params, eps, jnp.asarray(trans), jnp.asarray(geom),
            jnp.asarray(cells), cfg, fine_r=fine_r, coarse_c=coarse_c)
        assert int(esc_over) == 0, f"escape overflow in {dtype} smoke"
        pts, _ = fused._cell_points(jnp.asarray(cells), coarse_c, fine_r,
                                    jnp.asarray(geom))
        want = np.asarray(dense._decode_block(
            params, eps, None, jnp.asarray(trans), pts, cfg, folded="137"))
        got = np.asarray(vals)
        scale = max(1e-3, float(np.abs(want).max()))
        drift = float(np.abs(got - want).max())
        assert drift <= tol * scale, (
            f"fused {dtype} drift {drift:.4g} > {tol} * {scale:.4g}")
        print(f"  fused kernel {dtype}: OK ({cells.size} cells, "
              f"drift {drift:.2e} <= {tol} * {scale:.3g})", flush=True)
        results.append({"check": f"fused_kernel_{dtype}", "ok": True,
                        "cells": int(cells.size), "drift": drift,
                        "bound": tol * scale})
    return results


def check_marching() -> list[dict]:
    import jax.numpy as jnp

    from disn_tpu.ops import marching

    params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    lin = np.linspace(-1, 1, 17, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = (np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 0.6).astype(np.float32)

    # 3. device soup vs numpy oracle, exact scan order
    vol9 = vol[::2, ::2, ::2]
    soup_np = marching.marching_tets_np(vol9, params)
    pos, _, count = marching.marching_tets_jit(
        jnp.asarray(vol9), jnp.asarray(params), max_tris=4096)
    soup_dev = np.asarray(pos[: int(count)])
    assert soup_dev.shape == soup_np.shape, (
        f"soup count {soup_dev.shape} vs oracle {soup_np.shape}")
    np.testing.assert_allclose(soup_dev, soup_np, atol=1e-5,
                               err_msg="device soup vs numpy oracle")
    print(f"  marching soup vs oracle: OK ({len(soup_np)} tris)",
          flush=True)

    # 4. record-mode device extraction -> host assembly == owned-edge path
    ev, ef = marching.extract_mesh_owned(vol, params, iso=0.0, batch=512)
    gcap = marching._norm_gcap(17, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, 0.0, gcap)
    nc = int(ncd)
    assert int(gov) == 0, "group-cap overflow on the smoke sphere"
    n_iter = min(marching._qbucket(max(1, -(-nc // 512))),
                 -(-gcap * 64 // 512))
    rec_d, tq_d = marching._extract_records(vold, ids, ncd, iso=0.0,
                                            n_iter=n_iter, batch=512)
    av, af = marching.assemble_mesh_np(np.asarray(ids)[:nc],
                                       np.asarray(rec_d),
                                       np.asarray(tq_d), nc, 17, params)
    np.testing.assert_array_equal(af, ef, err_msg="record faces vs owned")
    assert av.shape == ev.shape, f"verts {av.shape} vs owned {ev.shape}"
    cell = 2.0 / 16
    vdrift = float(np.abs(av - ev).max())
    assert vdrift <= cell / 65535 + 1e-6, f"record verts drift {vdrift}"
    print(f"  records vs owned-edge: OK ({len(ef)} faces, "
          f"vert drift {vdrift:.2e})", flush=True)
    return [{"check": "marching_soup_vs_oracle", "ok": True,
             "tris": int(len(soup_np))},
            {"check": "records_vs_owned_edge", "ok": True,
             "faces": int(len(ef)), "vert_drift": vdrift}]


def _write_json(path: str | None, payload: dict) -> None:
    if path is None:
        return
    import json
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None,
                    help="write the machine-readable verdict here")
    args = ap.parse_args()
    import subprocess
    rev = subprocess.run(["git", "-C", "/root/repo", "rev-parse", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    if not tpu_reachable():
        print("tpu_smoke: TPU unreachable (tunnel down?) — SKIPPED",
              flush=True)
        _write_json(args.json, {"status": "skipped_tunnel_down",
                                "git": rev})
        return 3
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"expected tpu, got {dev}"
    print(f"tpu_smoke on {dev.device_kind}", flush=True)
    try:
        checks = check_fused_kernel() + check_marching()
    except AssertionError as e:
        _write_json(args.json, {"status": "fail", "device": dev.device_kind,
                                "git": rev, "error": str(e)})
        raise
    print("tpu_smoke: ALL OK", flush=True)
    _write_json(args.json, {"status": "pass", "device": dev.device_kind,
                            "git": rev, "checks": checks})
    return 0


if __name__ == "__main__":
    sys.exit(main())
