"""Round-5 train-throughput refresh: B=20 FULL-WIDTH VGG fwd+bwd on the
real TPU (verdict weak #3 — the only samples/s row predated the rounds
2-4 layer/encoder/sampling rework).

Measured under the round-4 measurement law (BASELINE.md): chained steps
with ONE scalar fetch at the end — per-step block_until_ready on the
axon tunnel costs a ~26 ms RTT each and measures the link, not the chip.

Arms:
  pure-step   8 distinct pre-uploaded device batches cycled through K
              chained, donated train steps; one loss fetch at the end —
              the device compute rate the loader must keep up with.
  with-loader the synthetic fixture dataset through the production
              PrefetchLoader (multi-worker, device double-buffer) — the
              trainer's sustained end-to-end rate on this host.

Reference bar: the TF1 trainer runs B=20 on one 2019 GPU
(train/train_sdf.py:30-64, README.md:128).

Usage: python scripts/probe_train_throughput.py [--steps 60] [--json OUT]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import tpu_reachable  # noqa: E402


def make_batches(cfg, n: int, seed: int = 0) -> list:
    rng = np.random.RandomState(seed)
    b, p = cfg.batch_size, cfg.num_sample_points
    trans = np.stack([np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]])
                      .astype(np.float32)] * b)
    out = []
    for _ in range(n):
        pts = rng.uniform(-0.8, 0.8, (b, p, 3)).astype(np.float32)
        out.append({
            "img": rng.rand(b, 137, 137, 3).astype(np.float32),
            "sdf_pt": pts,
            "sdf_pt_rot": pts,
            "sdf_val": (np.linalg.norm(pts, axis=-1, keepdims=True) - 0.5
                        ).astype(np.float32),
            "trans_mat": trans,
        })
    return out


def arm_pure_step(cfg, steps: int) -> float:
    import jax

    from disn_tpu.train import create_state, make_train_step

    state = create_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)  # donated state: steps chain in-place
    batches = [jax.device_put(b) for b in make_batches(cfg, 8)]
    # warm: compile + first real execution
    state, losses = step_fn(state, batches[0])
    state, losses = step_fn(state, batches[1])
    float(losses["overall_loss"])  # sync the warm-up
    t0 = time.perf_counter()
    for i in range(steps):
        state, losses = step_fn(state, batches[i % 8])
    last = float(losses["overall_loss"])  # ONE sync for the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(last), last
    return steps / dt


def arm_with_loader(cfg, steps: int, root: str) -> float:
    import jax

    from disn_tpu.data import listing, pipeline, synthetic
    from disn_tpu.train import create_state, make_train_step

    info = synthetic.build_dataset(root, views=2, num_samples=4096,
                                   grid_res=8)
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=2)
    # repeat the listing so the split covers `steps` batches per epoch
    reps = -(-(steps + 4) * cfg.batch_size // max(1, len(listinfo)))
    listinfo = listinfo * reps
    cats_limit = {k: v * reps for k, v in cats_limit.items()}
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=1, workers=3, seed=0)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    loader.start()
    it = iter(loader)
    state, losses = step_fn(state, next(it))
    state, losses = step_fn(state, next(it))
    float(losses["overall_loss"])
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        state, losses = step_fn(state, batch)
        n += 1
        if n >= steps:
            break
    last = float(losses["overall_loss"])
    dt = time.perf_counter() - t0
    loader.shutdown()
    assert np.isfinite(last), last
    return n / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--json", default=None)
    ap.add_argument("--loader-root", default="/dev/shm/train_probe_ds")
    args = ap.parse_args()
    if not tpu_reachable():
        print("probe_train_throughput: TPU unreachable — SKIPPED",
              flush=True)
        return 3
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from disn_tpu.config import Config
    # full width, B=20, 2048 pts — the config of record; --dtype bfloat16
    # measures the TPU-native training mode (bf16 compute, f32 params +
    # loss — MXU accumulates f32 internally; CLAUDE.md training notes)
    cfg = Config(compute_dtype=args.dtype)
    print(f"device {jax.devices()[0].device_kind}; B={cfg.batch_size}, "
          f"{cfg.num_sample_points} pts, width_mult={cfg.width_mult}, "
          f"compute={cfg.compute_dtype}", flush=True)
    sps = arm_pure_step(cfg, args.steps)
    print(f"  pure-step : {sps:.1f} steps/s = "
          f"{sps * cfg.batch_size:.0f} samples/s", flush=True)
    spl = arm_with_loader(cfg, args.steps, args.loader_root)
    print(f"  with-loader: {spl:.1f} steps/s = "
          f"{spl * cfg.batch_size:.0f} samples/s", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch_size": cfg.batch_size,
                       "compute_dtype": cfg.compute_dtype,
                       "num_sample_points": cfg.num_sample_points,
                       "pure_step_steps_per_s": sps,
                       "pure_step_samples_per_s": sps * cfg.batch_size,
                       "loader_steps_per_s": spl,
                       "loader_samples_per_s": spl * cfg.batch_size}, f,
                      indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
