"""Interleaved A/B: u8 rec stream (inside mask only, host-derived cross)
vs the full u16 cross<<8|inside stream, through image_to_mesh.

The u16 arm monkeypatches the two stream emitters with u8=False partials
(separate jit traces, both warmed); downstream derive gates on dtype so
both arms share every other code path. Alternates rep by rep (link drift
law). Usage: python scripts/probe_ab_rec8.py [pairs]
"""
from __future__ import annotations

import functools
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
                        dtype=np.uint8) for _ in range(pairs + 1)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    orig_split = m._records_masked_split
    orig_chunk = m._records_chunk_compact
    u16_split = functools.partial(orig_split, u8=False)
    u16_chunk = functools.partial(orig_chunk, u8=False)

    def set_u16(on: bool):
        m._records_masked_split = u16_split if on else orig_split
        m._records_chunk_compact = u16_chunk if on else orig_chunk

    # warm both arms
    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    set_u16(True)
    pipeline.warm_fused(params, imgs[0], trans, sdfp, cfg)
    set_u16(False)

    t_u8, t_u16 = [], []
    ref = None
    for i in range(pairs):
        for u16, ts in ((False, t_u8), (True, t_u16)):
            set_u16(u16)
            t0 = time.perf_counter()
            verts, faces = pipeline.image_to_mesh(params, imgs[i + 1],
                                                  trans, cfg)
            ts.append((time.perf_counter() - t0) * 1000)
            assert len(faces) > 1000
            if i == 0 and not u16:
                ref = (verts, faces)
            elif i == 0:
                np.testing.assert_array_equal(faces, ref[1])
                np.testing.assert_array_equal(verts, ref[0])
    set_u16(False)
    print(f"u8 : median {np.median(t_u8):.1f}  "
          f"{['%.0f' % t for t in t_u8]}")
    print(f"u16: median {np.median(t_u16):.1f}  "
          f"{['%.0f' % t for t in t_u16]}")


if __name__ == "__main__":
    main()
