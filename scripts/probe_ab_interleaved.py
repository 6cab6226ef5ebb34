"""INTERLEAVED compact-tq A/B: alternate masked/compact e2e reps within
one process so link drift (25-40 ms RTT swings minute to minute) hits both
arms equally. The round-3-end A/B ran the arms sequentially (131.2 vs
140.6 ms) — a 10 ms delta is inside the link's per-minute drift, so it
decided the default on noise. Device-side truth (probe_device_chain):
compact records stage 10.5 ms vs masked 6.5, compact saves only ~80 KB of
fetch (~2 ms at 40 MB/s) — expectation: masked wins by ~2 ms.

Usage: python scripts/probe_ab_interleaved.py [reps_per_arm]
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

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    base = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    cfgs = {"compact": base.replace(compact_tq=True),
            "masked": base.replace(compact_tq=False)}
    params = synthetic.analytic_octahedron_params(base, r=0.6)
    rng = np.random.RandomState(0)
    trans = synthetic.demo_trans_mat()

    # warm both arms (compile + spec cache + first-exec upload)
    for name, cfg in cfgs.items():
        for _ in range(3):
            img = rng.rand(1, base.img_h, base.img_w, 3).astype(np.float32)
            out = pipeline.image_to_mesh(params, img, trans, cfg)
            assert out is not None

    times: dict[str, list[float]] = {k: [] for k in cfgs}
    for i in range(reps):
        for name, cfg in cfgs.items():
            img = rng.rand(1, base.img_h, base.img_w, 3).astype(np.float32)
            t0 = time.perf_counter()
            out = pipeline.image_to_mesh(params, img, trans, cfg)
            dt = (time.perf_counter() - t0) * 1000
            assert out is not None
            times[name].append(dt)
            print(f"rep {i} {name}: {dt:7.1f} ms", flush=True)
    for name, ts in times.items():
        a = np.asarray(ts)
        print(f"{name}: median {np.median(a):.1f}  min {a.min():.1f}  "
              f"mean {a.mean():.1f}", flush=True)


if __name__ == "__main__":
    main()
