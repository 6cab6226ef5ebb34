"""Interleaved A/B: per-chunk tqc cap tightness at C=4 chunks.

Arm A (current): caps = qbucket(nvk * 1.25)   (<= 1.43x nv bytes)
Arm B:           caps = ebucket(nvk * 1.10)   (<= 1.24x nv bytes)

The round-5 C=2 A/B (probe_ab_chunks) conflated chunk count with cap
tightness and lost on stream concurrency; this isolates the caps. Tighter
caps cut only DEAD tqc bytes (~26 KB at production nv); the risk is a cap
miss (exact re-run, ~40 ms) on image-to-image nv drift — the miss proxy
counts >200 ms reps.

Usage: python scripts/probe_ab_caps.py [pairs]
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
    from disn_tpu.ops import marching as m

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                        dtype=np.uint8) for _ in range(3 * pairs + 4)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    def set_arm(b: bool):
        pipeline._NVCAP_MARGIN = 1.10 if b else 1.25
        pipeline._NVCAP_BUCKET = m._ebucket if b else m._qbucket
        pipeline._SPEC_CACHE.clear()

    # warm both arms' jits (ladder + neighbor caps)
    set_arm(False)
    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    set_arm(True)
    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)

    t_a, t_b, miss = [], [], [0, 0]
    k = 1
    for i in range(pairs):
        for b, ts in ((False, t_a), (True, t_b)):
            set_arm(b)
            # reseed the prediction ladder, unmeasured (seed -> masked)
            pipeline.image_to_mesh(params, imgs[k], trans, cfg)
            pipeline.image_to_mesh(params, imgs[k + 1], trans, cfg)
            t0 = time.perf_counter()
            _, faces = pipeline.image_to_mesh(params, imgs[k + 2], trans,
                                              cfg)
            dt = (time.perf_counter() - t0) * 1000
            ts.append(dt)
            if dt > 200:
                miss[int(b)] += 1
            assert len(faces) > 1000
        k += 3  # fresh images every pair, shared between arms
    set_arm(False)
    print(f"A (q*1.25): median {np.median(t_a):.1f}  "
          f"{['%.0f' % t for t in t_a]}")
    print(f"B (e*1.10): median {np.median(t_b):.1f}  "
          f"{['%.0f' % t for t in t_b]}")
    print(f">200ms reps (miss proxy): A={miss[0]} B={miss[1]}")


if __name__ == "__main__":
    main()
