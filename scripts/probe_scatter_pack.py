"""Scatter-packing microbench for the fine-value scatter (pbm hot path).

Production: ~1.3M per-point f32 scatter rows into the 257^3 volume
(~9 ns/row ~ 11 ms). Each cell's 4 x-adjacent points are CONTIGUOUS and
16B-aligned in the flat volume, so a [N/4, 4]-row scatter (scatter dim 0,
dim 1 as a full window) would cut rows 4x — IF Mosaic lowers it at
per-row cost like gathers, and not like the 1D update_window_dims scatter
that measured 70x slower in round 3. This probe measures:
  (a) per-point baseline        vol1d.at[idx].set(vals)
  (b) [N/4,4]-row 2D scatter    vol2d.at[idx4].set(vals4)  (jnp .at rows)
  (c) same via explicit lax.scatter with full trailing window

Usage: python scripts/probe_scatter_pack.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    R = 257
    Np = R ** 3 + 1
    Np4 = -(-Np // 4) * 4
    n_pts = 40 * 32768  # production bucket ~1.3M
    rng = np.random.RandomState(0)
    # cell-run bases: 4-aligned flat indices (distinct), like fx=4cx runs
    bases = rng.choice(Np4 // 4 - 2, size=n_pts // 4, replace=False)
    bases = bases.astype(np.int32)
    idx = (bases[:, None] * 4 + np.arange(4, dtype=np.int32)).reshape(-1)
    vals = rng.rand(n_pts).astype(np.float32)

    vol1 = jnp.zeros((Np4,), jnp.float32)
    vol2 = jnp.zeros((Np4 // 4, 4), jnp.float32)
    idx_d = jnp.asarray(idx)
    b_d = jnp.asarray(bases)
    v1_d = jnp.asarray(vals)
    v4_d = jnp.asarray(vals.reshape(-1, 4))
    for x in (vol1, vol2, idx_d, b_d, v1_d, v4_d):
        jax.block_until_ready(x)

    f_point = jax.jit(lambda v, i, x: v.at[i].set(x, mode="drop"))
    f_rows = jax.jit(lambda v, b, x: v.at[b].set(x, mode="drop"))

    tail = jax.jit(lambda x: jnp.sum(x[:8]))

    def timed_total(f, k):
        s = tail(f().reshape(-1))
        float(np.asarray(s))
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f()
        s = tail(out.reshape(-1))
        float(np.asarray(s))
        return (time.perf_counter() - t0) * 1000

    def sweep(name, f, ks=(1, 2, 4, 8)):
        tot = {k: min(timed_total(f, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        print(f"{name}: {b:.2f} ms/launch (+{a:.1f})", flush=True)

    # correctness of the row form
    o1 = np.asarray(f_point(vol1, idx_d, v1_d))
    o2 = np.asarray(f_rows(vol2, b_d, v4_d)).reshape(-1)
    assert (o1 == o2).all(), "row scatter mismatch"
    print(f"row scatter equivalent ({n_pts} pts, {n_pts // 4} rows)",
          flush=True)

    sweep("per-point scatter (1.3M rows)",
          lambda: f_point(vol1, idx_d, v1_d))
    sweep("[N/4,4]-row scatter (327k rows)",
          lambda: f_rows(vol2, b_d, v4_d))

    # gather calibration on the same volume for scale
    g = jax.jit(lambda v, i: jnp.take(v, i))
    sweep("per-point gather (1.3M rows)", lambda: g(vol1, idx_d))
    g4 = jax.jit(lambda v, b: jnp.take(v, b, axis=0))
    sweep("[N/4,4]-row gather (327k rows)", lambda: g4(vol2, b_d))


if __name__ == "__main__":
    main()
