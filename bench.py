"""Headline benchmark: single-image -> mesh wall clock at sdf_res=256 (the
BASELINE.json north star: < 100 ms per chip).

Protocol: full-width two-stream DISN (VGG-16 encoder, bf16 compute, tf1
sampling -> folded-137 local features), PRODUCTION inference path — dynamic
two-level sparse volume through the fused Pallas cell-decode kernel with
the extraction scan fused into the same jit, record-mode owned-edge
marching tetrahedra (slot-dense per-cell records, static shapes, zero
count syncs) fetched over parallel streams and assembled to a welded mesh
by native/meshassemble.cpp. The decoder weights are the analytic-octahedron
fixture (data/synthetic.py): a trained-model-SHAPED field (|x|+|y|+|z| - r,
exactly representable by the MLP) so the sparse band engages exactly as
with a converged checkpoint — RANDOM weights produce a non-distance-like
field that silently falls back to dense and benchmarks the wrong path.
Mesh size at 257^3: ~351k triangles.

Timing discipline (learned on the axon tunnel): a FRESH input image per
repetition and an un-timed fresh-input warm-up pass (the first real
execution after compile pays a one-time multi-second upload), wall clock to
the welded numpy mesh on the host.

vs_baseline: the reference publishes no wall clock (it runs 79 sequential
GPU sess.runs per image plus an external marching-cubes binary). The pinned
target is BASELINE.json's <100 ms image->mesh: vs_baseline = 100 / measured
ms (>= 1.0 means target met).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

TARGET_MS = 100.0  # BASELINE.json north star


def tpu_reachable(timeout: float = 180.0) -> bool:
    """Probe TPU backend init in a KILLABLE subprocess: when the axon
    tunnel is down, in-process `jax.devices()` BLOCKS for tens of minutes
    before raising UNAVAILABLE (measured during an outage), and a failed
    init poisons the process-global backend — so the probe must be
    out-of-process and bounded. Healthy init takes ~5-20 s."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(any(d.platform == 'tpu' "
             "for d in jax.devices()))"],
            capture_output=True, timeout=timeout, text=True)
        return out.stdout.strip().endswith("True")
    except (subprocess.TimeoutExpired, OSError):
        return False


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = tpu_reachable()
    if not on_tpu:
        # tunnel down/unreachable: the driver contract is ONE JSON line
        # regardless — force CPU BEFORE backend init, emit the smoke metric
        jax.config.update("jax_platforms", "cpu")
    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    if on_tpu:
        cfg = Config(sdf_res=256, compute_dtype="bfloat16")
        reps = 9  # tunnel fetch jitter is ±10-15 ms; a 9-rep median is
        # stable where a 5-rep one moved ~15 ms run to run
    else:  # CPU smoke fallback so the bench always emits a line
        cfg = Config(sdf_res=32, compute_dtype="float32", num_classes=64,
                     width_mult=0.125)
        reps = 2

    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    # u8 images, like the h5 sources: normalized on-device (disn.encode)
    # so the per-rep upload is 56 KB, not 225 KB of f32 on the critical
    # path before phase_a (~4-7 ms at the tunnel's 22-50 MB/s)
    imgs = [rng.randint(0, 256, size=(1, cfg.img_h, cfg.img_w, 3),
                        dtype=np.uint8) for _ in range(reps + 2)]
    trans = synthetic.demo_trans_mat()

    # Warm EVERY jit the timed path can hit (prediction ladder: seed ->
    # masked -> chunked-compact, plus the chunk jits one tqc bucket either
    # side): a fresh process otherwise compiles the cchunk stage inside the
    # first timed reps, poisoning the 9-rep median (~10 ms of round-4
    # driver-visible noise vs hand-warmed runs). warm_fused also serves as
    # the first real execution (the one-time input-upload cost).
    sdf_box = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    warm = pipeline.warm_fused(params, imgs[0], trans, sdf_box, cfg)
    if warm is None:  # fused path ineligible (CPU smoke cfg): plain warm-up
        pipeline.image_to_mesh(params, imgs[0], trans, cfg)
    pipeline.image_to_mesh(params, imgs[1], trans, cfg)

    times = []
    n_faces = 0
    for i in range(reps):
        t0 = time.perf_counter()
        _, faces = pipeline.image_to_mesh(params, imgs[i + 2], trans, cfg)
        times.append(time.perf_counter() - t0)
        n_faces = len(faces)
    ms = float(np.median(times) * 1000.0)
    assert n_faces > 1000, n_faces  # the mesh must be real

    print(json.dumps({
        "metric": "image_to_mesh_ms_257" if on_tpu
        else "image_to_mesh_ms_cpu_smoke",
        "value": round(ms, 1),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
