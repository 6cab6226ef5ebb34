"""Interleaved A/B: sparse-words flow (no dense volume — the per-point
value scatter, full-volume change scan and upsample never run) vs the
dense-volume flow, full production latency path at 257^3.

Usage: python scripts/probe_ab_swords.py [pairs]
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
    base = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    cfgs = {True: base.replace(sparse_words=True),
            False: base.replace(sparse_words=False)}
    params = synthetic.analytic_octahedron_params(base, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, size=(1, base.img_h, base.img_w, 3),
                        dtype=np.uint8) for _ in range(pairs + 4)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    ref = None
    for arm in (True, False):
        out = pipeline.warm_fused(params, imgs[0], trans, sdfp, cfgs[arm])
        assert out is not None, f"warm fell back (arm={arm})"
        if ref is None:
            ref = out
        else:  # mesh parity across arms on hardware
            np.testing.assert_array_equal(out[1], ref[1])
            np.testing.assert_array_equal(out[0], ref[0])
        assert (cfgs[arm], float(base.iso), 32768) \
            not in pipeline._SWORDS_SKIP
    t = {True: [], False: []}
    for i in range(pairs):
        for arm in (True, False):
            t0 = time.perf_counter()
            _, faces = pipeline.image_to_mesh(params, imgs[i + 4], trans,
                                              cfgs[arm])
            t[arm].append((time.perf_counter() - t0) * 1000)
            assert len(faces) > 1000
    for arm, tag in ((True, "sparse-words"), (False, "dense-volume")):
        print(f"{tag}: median {np.median(t[arm]):.1f}  "
              f"{['%.0f' % x for x in t[arm]]}")


if __name__ == "__main__":
    main()
