"""Per-rep, per-stage breakdown of the bench.py e2e path on the real TPU.

Times _fused_dispatch (enqueue + puts), _fused_collect (flags wait +
validate + assembly join), and prints every rep so jitter is visible —
bench.py's single median hides whether a bad run is RTT, fetch bandwidth,
or device regression.

Usage: python scripts/probe_e2e_breakdown.py [reps]
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

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
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

    pipeline.image_to_mesh(params, imgs[0], trans, cfg)  # compile
    pipeline.image_to_mesh(params, imgs[1], trans, cfg)  # first real exec

    tot = []
    for i in range(reps):
        t0 = time.perf_counter()
        ctx = pipeline._fused_dispatch(params, imgs[i + 2], trans, sdfp,
                                       cfg, iso=cfg.iso)
        t1 = time.perf_counter()
        # flags ride the 6th fetch stream: arrival = device chain done +
        # tiny fetch; everything after is record-fetch wait + assembly
        tf = t1
        sizes = []
        if ctx.get("futs"):
            # flags: futs[-1] in cchunk mode, futs[5] in masked mode
            arr = ctx["futs"][-1 if ctx.get("mode") == "cchunk"
                              else 5].result()
            tf = time.perf_counter()
            lands = []
            for f in ctx["futs"][:-1]:
                a = f.result()
                lands.append((time.perf_counter() - t1) * 1e3)
                sizes.append(a.nbytes)
            print(f"    streams: {[f'{b / 1024:.0f}K@{t:.0f}' for b, t in zip(sizes, lands)]} flags@{(tf - t1) * 1e3:.0f} ({arr.nbytes}B)",
                  flush=True)
        tr = time.perf_counter()
        out = pipeline._fused_collect(ctx)
        t2 = time.perf_counter()
        assert out is not None
        mode = ctx.get("mode")
        tot.append((t2 - t0) * 1000)
        print(f"rep {i}: total {(t2 - t0) * 1e3:7.1f}  "
              f"dispatch {(t1 - t0) * 1e3:6.1f}  "
              f"flags@ {(tf - t1) * 1e3:6.1f}  recs@ {(tr - t1) * 1e3:6.1f}  "
              f"rest {(t2 - tr) * 1e3:6.1f}  mode={mode}", flush=True)
    arr = np.asarray(tot)
    print(f"median {np.median(arr):.1f}  min {arr.min():.1f}  "
          f"max {arr.max():.1f}", flush=True)


if __name__ == "__main__":
    main()
