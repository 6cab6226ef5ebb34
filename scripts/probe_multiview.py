"""Measure multiview fusion at the production grid on the real TPU:
sparse two-level cull vs dense streaming, V=3 views -> 257^3 volume ->
mesh (verdict round-4 item 8: 'multiview 257^3 measured, either sparse
or justified').

Usage: python scripts/probe_multiview.py [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import multiview, pipeline

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    V = 3
    trans = np.stack([synthetic.demo_trans_mat() for _ in range(V)])
    sp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    def run(arm, imgs):
        t0 = time.perf_counter()
        vol = (multiview.multiview_sdf_sparse if arm == "sparse"
               else multiview.multiview_sdf)(params, imgs, trans, sp, cfg)
        assert vol is not None
        verts, faces = pipeline.volume_to_mesh(vol, sp, iso=cfg.iso)
        dt = (time.perf_counter() - t0) * 1000
        return dt, len(faces)

    imgs0 = rng.randint(0, 256, size=(V, 137, 137, 3), dtype=np.uint8)
    for arm in ("sparse", "dense"):
        run(arm, imgs0)  # compile + first exec
        ts = []
        nf = 0
        for i in range(reps):
            imgs = rng.randint(0, 256, size=(V, 137, 137, 3),
                               dtype=np.uint8)
            dt, nf = run(arm, imgs)
            ts.append(dt)
        print(f"{arm}: median {np.median(ts):.0f} ms "
              f"({['%.0f' % t for t in ts]}, {nf} tris, V={V})", flush=True)


if __name__ == "__main__":
    main()
