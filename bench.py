"""Headline benchmark: dense SDF query throughput at 256^3 (the BASELINE.md
north-star metric).

Protocol: full-width two-stream DISN (VGG-16 encoder, 1472-d local features),
bf16 compute, one 137x137 image encoded once, then the (sdf_res+1)^3 query
grid streamed through project -> multi-scale feature sampling -> two-stream
MLP on a single chip (test/create_sdf.py's 79x 214,669-point sess.run loop,
re-imagined as block-streamed XLA).

vs_baseline: the reference publishes no wall clock (BASELINE.md); the pinned
target derived from BASELINE.json's north star is image->mesh < 100 ms at
sdf_res=256, i.e. 257^3 / 0.1 s = 169.7M queries/sec. vs_baseline is measured
throughput / that target (>= 1.0 means target met).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


TARGET_QPS = 257 ** 3 / 0.1  # BASELINE.json north star


def main() -> None:
    import jax
    # reuse the repo-local cache that already holds the production shapes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    from disn_tpu.config import Config
    from disn_tpu.infer import dense
    from disn_tpu.models import disn

    if on_tpu:
        # production defaults: bf16 compute, 4-tap native sampling (the
        # tf1-exact 16-tap mode is for checkpoint-parity validation)
        cfg = Config(sdf_res=256, compute_dtype="bfloat16",
                     sampling="native")
        block = 131072
        reps = 3
    else:  # CPU smoke fallback so the bench always emits a line
        cfg = Config(sdf_res=32, compute_dtype="float32", num_classes=64,
                     width_mult=0.125)
        block = 4096
        reps = 1

    params = disn.init(cfg, jax.random.PRNGKey(0))
    from disn_tpu.data.synthetic import demo_trans_mat
    rng = np.random.RandomState(0)
    img = rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
    trans = demo_trans_mat()
    sdf_params = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    fn = dense.make_dense_sdf_fn(cfg, block=block)
    import jax.numpy as jnp
    args = (params, jnp.asarray(img), jnp.asarray(trans),
            jnp.asarray(sdf_params))
    float(fn(*args)[0, 0, 0])  # compile + warm up

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        # scalar fetch forces execution: block_until_ready can return early
        # on queued-but-unexecuted work under the axon tunnel backend; the
        # index must DIFFER from the warm-up fetch or the tunnel may serve
        # it from cache without executing
        float(fn(*args)[0, 0, i + 1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    total = cfg.grid_resolution ** 3
    qps = total / dt

    print(json.dumps({
        "metric": "sdf_queries_per_sec_256cubed" if on_tpu
        else "sdf_queries_per_sec_cpu_smoke",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / TARGET_QPS, 4),
    }))


if __name__ == "__main__":
    main()
