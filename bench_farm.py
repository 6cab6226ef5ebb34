"""Eval-farm benchmark: sustained image->mesh throughput (ms/image) through
the REAL reconstruct_split machinery — reader thread prefetching view h5s,
strictly-sequential device work on the main thread, deferred native mesh
assembly + OBJ writes on the writer pool (round-2 verdict weak #3: the farm
number was not driver-visible).

Workload: a synthetic dataset tree (analytic-SDF renders; data/synthetic.py)
reconstructed at sdf_res=256 with the full-width analytic-octahedron decoder
— the same trained-model-SHAPED field bench.py uses, so the sparse band and
the fused kernel engage exactly as in production. OBJ outputs go to a temp
dir; timing excludes the first (compile) pass over the split.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = 100 / ms_per_image (the BASELINE.json <100 ms/chip north star
applied to sustained throughput).
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

TARGET_MS = 100.0


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import tpu_reachable
    on_tpu = tpu_reachable()
    if not on_tpu:
        # tunnel down/unreachable: the driver contract is ONE JSON line
        # regardless — force CPU BEFORE backend init (an in-process failed
        # init blocks for tens of minutes and poisons the backend)
        jax.config.update("jax_platforms", "cpu")
    from disn_tpu import cli
    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    if on_tpu:
        views = 6
        cfg = Config(sdf_res=256, compute_dtype="bfloat16", view_num=views)
    else:  # CPU smoke fallback
        views = 2
        cfg = Config(sdf_res=32, compute_dtype="float32", num_classes=64,
                     width_mult=0.125, view_num=views)

    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    # RAM-backed IO when available: the bench measures the reconstruction
    # pipeline (prefetch reader, device work, native assembly, OBJ
    # formatting, write syscalls), not the host's block-device quota —
    # this machine's cgroup throttles vda to ~15 MB/s, which at ~12.5 MB
    # per 351k-tri OBJ would turn any farm (the reference's equally) into
    # a pure disk benchmark
    io_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench_farm_ds_", dir=io_root)
    out_dir = tempfile.mkdtemp(prefix="bench_farm_out_", dir=io_root)
    try:
        synthetic.build_dataset(root, views=views, splits=("test",))
        listinfo, _, paths = cli.data_handles(cfg, root, "test")

        # warm pass: compiles + first-execution weight upload
        pipeline.reconstruct_split(params, cfg, paths, listinfo[:2],
                                   out_dir)
        t0 = time.perf_counter()
        written = pipeline.reconstruct_split(params, cfg, paths, listinfo,
                                             out_dir)
        dt = time.perf_counter() - t0
        assert written, "farm produced no meshes"
        ms = dt * 1000.0 / len(written)
        print(json.dumps({
            "metric": "farm_ms_per_image_257" if on_tpu
            else "farm_ms_per_image_cpu_smoke",
            "value": round(ms, 1),
            "unit": "ms/image",
            "vs_baseline": round(TARGET_MS / ms, 4),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
