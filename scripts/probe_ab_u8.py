"""Interleaved A/B: u8 image upload (on-device /255) vs f32 host-normalized.

Link RTT and bandwidth drift ~2x minute to minute (MEASUREMENT LAW,
CLAUDE.md): never compare medians from separate runs. This alternates the
two dtypes rep by rep through the full image_to_mesh path.

Usage: python scripts/probe_ab_u8.py [pairs]
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

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs_u8 = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                           dtype=np.uint8) for _ in range(pairs + 1)]
    imgs_f32 = [u.astype(np.float32) / 255.0 for u in imgs_u8]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    # warm BOTH dtype traces fully
    pipeline.warm_fused(params, imgs_u8[0], trans, sdfp, cfg)
    pipeline.warm_fused(params, imgs_f32[0], trans, sdfp, cfg)

    t_u8, t_f32 = [], []
    for i in range(pairs):
        for arr, ts in ((imgs_u8[i + 1], t_u8), (imgs_f32[i + 1], t_f32)):
            t0 = time.perf_counter()
            _, faces = pipeline.image_to_mesh(params, arr, trans, cfg)
            ts.append((time.perf_counter() - t0) * 1000)
            assert len(faces) > 1000
    print(f"u8 : median {np.median(t_u8):.1f}  "
          f"{['%.0f' % t for t in t_u8]}")
    print(f"f32: median {np.median(t_f32):.1f}  "
          f"{['%.0f' % t for t in t_f32]}")


if __name__ == "__main__":
    main()
