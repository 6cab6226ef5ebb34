"""Profile the post-fetch assembly tail stage by stage on landed data.

probe_e2e_breakdown's 'rest' (time from last-stream landing to mesh) was
6-10 ms round 5; this separates: rec concat + cross derive, the C faces
pass, tqc join/slice, the C verts pass, and the python glue around them —
so tail work targets the real cost, not a guess.

Usage: python scripts/probe_tail_profile.py [reps]
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

    from disn_tpu import native
    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline
    from disn_tpu.ops import marching as m

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                        dtype=np.uint8) for _ in range(reps + 2)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    pipeline.image_to_mesh(params, imgs[1], trans, cfg)

    for i in range(reps):
        ctx = pipeline._fused_dispatch(params, imgs[i + 2], trans, sdfp,
                                       cfg, iso=cfg.iso, optimistic=False)
        if ctx.get("mode") != "cchunk":
            print(f"rep {i}: mode={ctx.get('mode')} (skip)", flush=True)
            pipeline._fused_collect(ctx)
            continue
        futs = ctx["futs"]
        for f in futs:
            f.result()
        R = cfg.grid_resolution
        t0 = time.perf_counter()
        blk_f, recs_join, tq_join, chunk_nvs = m._records_parts(
            futs, "cchunk", R)
        blk_np = blk_f.result()
        t1 = time.perf_counter()
        recs = recs_join()          # concat + derive
        t2 = time.perf_counter()
        n = m._mask_cell_count(blk_np)
        nvks = chunk_nvs()          # popcounts
        t3 = time.perf_counter()
        faces = native.mesh_faces_blocks(blk_np, recs, n, R)
        t4 = time.perf_counter()
        tq = tq_join()              # tqc slices + concat
        t5 = time.perf_counter()
        verts = native.mesh_verts_blocks(
            blk_np, recs, tq, n, R, np.asarray(sdfp, np.float32),
            compact=True, nv=sum(nvks))
        t6 = time.perf_counter()
        # the real collect for comparison (validate + fin on landed data)
        out = pipeline._fused_collect(ctx)
        t7 = time.perf_counter()
        ms = lambda a, b: (b - a) * 1e3  # noqa: E731
        print(f"rep {i}: parts+blk {ms(t0, t1):5.2f}  derive {ms(t1, t2):5.2f}"
              f"  counts {ms(t2, t3):5.2f}  faces {ms(t3, t4):5.2f}"
              f"  tqjoin {ms(t4, t5):5.2f}  verts {ms(t5, t6):5.2f}"
              f"  | manual total {ms(t0, t6):5.2f}"
              f"  collect(fin) {ms(t6, t7):5.2f}"
              f"  tris={len(faces)} nv={len(verts)}", flush=True)
        assert out is not None


if __name__ == "__main__":
    main()
