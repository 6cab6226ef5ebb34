"""Probe: can the fine-value scatter halve its row count by packing two
x-adjacent f32 values into one complex64 row?

The fine pass's 750k per-point scatter rows cost ~8.3 ms at 257^3 (scatter
law: ~11 ns/ROW regardless of row size). Fine points come in x-runs of 4 at
even origins, so (x, x+1) pairs are aligned — if XLA scatters a c64 row as
ONE row (not decomposed into two f32 scatters), rows halve. Chained-sync
timing per the measurement law (enqueue K, one jitted reduce, fetch one
scalar; noop RTT subtracted).

Usage: python scripts/probe_scatter_c64.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, args, reps=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(*a):
        out = fn(*a)
        return jnp.sum(out[:7]).real if jnp.iscomplexobj(out) \
            else jnp.sum(out[:7])

    probe(*args).block_until_ready()
    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        last = probe(*args)
    _ = float(last)
    return (time.perf_counter() - t0) * 1000 / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    R3 = 258 * 257 * 257
    N = 750_000 & ~3  # production-order row count, multiple of 4
    rng = np.random.RandomState(0)
    # even-aligned pair targets (like x-runs of 4 at even origins)
    base = np.sort(rng.choice(R3 // 4, N // 4, replace=False)) * 4
    idx = (base[:, None] + np.arange(4)[None, :]).reshape(-1)
    vals = rng.rand(N).astype(np.float32)

    dst = jnp.zeros((R3,), jnp.float32)
    idx_d = jnp.asarray(idx, jnp.int32)
    vals_d = jnp.asarray(vals)

    def scat_f32(dst, idx, vals):
        return dst.at[idx].set(vals, mode="drop",
                               unique_indices=True,
                               indices_are_sorted=True)

    dst2 = jnp.zeros((R3 // 2,), jnp.complex64)
    idx2_d = jnp.asarray(idx.reshape(-1, 2)[:, 0] // 2, jnp.int32)
    v2 = vals.reshape(-1, 2)
    vals2_d = jnp.asarray(v2[:, 0] + 1j * v2[:, 1], jnp.complex64)

    def scat_c64(dst, idx, vals):
        return dst.at[idx].set(vals, mode="drop",
                               unique_indices=True,
                               indices_are_sorted=True)

    # noop floor
    def noop(dst, idx, vals):
        return dst

    floor = timed(noop, (dst, idx_d, vals_d))
    t_f32 = timed(scat_f32, (dst, idx_d, vals_d))
    try:
        t_c64 = timed(scat_c64, (dst2, idx2_d, vals2_d))
    except Exception as e:  # noqa: BLE001
        # VERDICT (round 5, v5e): c64 scatter raises UNIMPLEMENTED on the
        # TPU backend — the pair-packing row halving is a dead end.
        print(f"f32 {N} rows    : {t_f32:6.2f} ms  (net {t_f32 - floor:.2f})")
        print(f"c64: UNAVAILABLE on this backend ({type(e).__name__})")
        return
    print(f"noop floor      : {floor:6.2f} ms")
    print(f"f32 {N} rows    : {t_f32:6.2f} ms  (net {t_f32 - floor:.2f})")
    print(f"c64 {N // 2} rows: {t_c64:6.2f} ms  (net {t_c64 - floor:.2f})")

    # correctness: unpacked c64 == f32 scatter on the pair lanes
    a = np.asarray(scat_f32(dst, idx_d, vals_d))
    b = np.asarray(scat_c64(dst2, idx2_d, vals2_d))
    bb = np.empty((R3,), np.float32)
    bb[0::2] = b.real
    bb[1::2] = b.imag
    assert np.array_equal(a, bb), "c64 pack mismatch"
    print("bit-exact: yes")


if __name__ == "__main__":
    main()
