"""Interleaved A/B: chunk-incremental (lag-1) speculative assembly vs the
join-all-then-assemble flow, through the full image_to_mesh path.

The incremental path (native.BlockAssembler) advances the faces pass as
each rec chunk lands and emits each chunk's verts immediately, so only the
last chunk's rows remain after the final stream — the join-all flow pays
the whole faces+verts cost (~8 ms at 351k tris) serially there.

Usage: python scripts/probe_ab_incr.py [pairs]
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
    from disn_tpu.infer import pipeline
    from disn_tpu.ops import marching

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                        dtype=np.uint8) for _ in range(2 * pairs + 1)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    # seed the speculative cache so every timed rep takes the cchunk path
    pipeline.image_to_mesh(params, imgs[0], trans, cfg)
    pipeline.image_to_mesh(params, imgs[0], trans, cfg)

    t_incr, t_join = [], []
    nf = []
    for i in range(pairs):
        for knob, ts in ((True, t_incr), (False, t_join)):
            marching._INCR_ASM = knob
            t0 = time.perf_counter()
            _, faces = pipeline.image_to_mesh(params, imgs[1 + 2 * i
                                                           + (not knob)],
                                              trans, cfg)
            ts.append((time.perf_counter() - t0) * 1000)
            nf.append(len(faces))
    marching._INCR_ASM = True
    assert len(set(nf)) == 1, nf
    print(f"incr: median {np.median(t_incr):.1f}  "
          f"{['%.0f' % t for t in t_incr]}")
    print(f"join: median {np.median(t_join):.1f}  "
          f"{['%.0f' % t for t in t_join]}")


if __name__ == "__main__":
    main()
