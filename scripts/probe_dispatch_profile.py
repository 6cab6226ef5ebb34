"""cProfile the latency path's DISPATCH python (stage 1 + submit): the
e2e breakdown reads 5-11 ms of single-core host work before the device
chain even queues — find where it goes.

Usage: python scripts/probe_dispatch_profile.py [reps]
"""
from __future__ import annotations

import cProfile
import io
import pstats
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
    from disn_tpu.infer import pipeline

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                        dtype=np.uint8) for _ in range(reps + 3)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    # seed the prediction ladder so dispatch takes the cchunk hit path
    pipeline.image_to_mesh(params, imgs[1], trans, cfg)
    pipeline.image_to_mesh(params, imgs[2], trans, cfg)

    # plain timing first (no profiler overhead)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        ctx = pipeline._fused_dispatch(params, imgs[3 + (i % reps)], trans,
                                       sdfp, cfg, cfg.iso)
        ts.append((time.perf_counter() - t0) * 1000)
        pipeline._fused_collect(ctx)  # drain so the ladder stays seeded
    print(f"dispatch wall: median {np.median(ts):.2f} ms "
          f"({['%.1f' % t for t in ts[:10]]})", flush=True)

    pr = cProfile.Profile()
    for i in range(reps):
        img = imgs[3 + (i % reps)]
        pr.enable()
        ctx = pipeline._fused_dispatch(params, img, trans, sdfp, cfg,
                                       cfg.iso)
        pr.disable()
        pipeline._fused_collect(ctx)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(32)
    print(s.getvalue())


if __name__ == "__main__":
    main()
