"""Is the eval farm device-bound or host-CPU-bound on this 1-core host?

Runs the real reconstruct_split on a synthetic split and reports wall
ms/image vs process-CPU ms/image (all threads). CPU/image ~= wall/image
means the single core is the bottleneck (assembly + OBJ formatting +
reader decode), not the device or the link.

Usage: python scripts/probe_farm_breakdown.py [views]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from disn_tpu import cli
    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    views = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = (Config(sdf_res=256, compute_dtype="bfloat16", view_num=views)
           if on_tpu else
           Config(sdf_res=32, compute_dtype="float32", num_classes=64,
                  width_mult=0.125, view_num=views))
    if "masked" in sys.argv:  # A/B: force the masked record stream
        cfg = cfg.replace(compact_tq=False)
        print("A/B arm: compact_tq=False (masked records)", flush=True)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    io_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="farm_probe_ds_", dir=io_root)
    out_dir = tempfile.mkdtemp(prefix="farm_probe_out_", dir=io_root)
    try:
        synthetic.build_dataset(root, views=views, splits=("test",))
        listinfo, _, paths = cli.data_handles(cfg, root, "test")
        pipeline.reconstruct_split(params, cfg, paths, listinfo[:2],
                                   out_dir)  # warm
        w0, c0 = time.perf_counter(), time.process_time()
        written = pipeline.reconstruct_split(params, cfg, paths, listinfo,
                                             out_dir)
        wall = (time.perf_counter() - w0) * 1000 / len(written)
        cpu = (time.process_time() - c0) * 1000 / len(written)
        print(f"images {len(written)}  wall {wall:.1f} ms/img  "
              f"process-CPU {cpu:.1f} ms/img  "
              f"({'CPU-BOUND' if cpu > 0.8 * wall else 'device/link-bound'})",
              flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
