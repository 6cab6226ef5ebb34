"""When does a d2h fetch issued DURING device execution actually land?

flags@ in probe_e2e_breakdown measures ~130-160 ms while the device chain
is only ~67 ms — this probe separates: (a) fetch issued while the jit is
still running (the production pattern: records_submit right after
dispatch), (b) fetch issued after completion, (c) copy_to_host_async
primed right after dispatch. If (a) >> chain + RTT, the tunnel serializes
the readiness wait and the transfer as two round trips — or worse, parks
the fetch until some polling tick.

Usage: python scripts/probe_fetch_latency.py
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

    # a ~60 ms kernel standing in for the production chain: loop a matmul
    m = jax.block_until_ready(
        jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3)

    @jax.jit
    def work(a):
        def body(_, x):
            return x @ a * 1e-3
        out = jax.lax.fori_loop(0, 40, body, a)
        return jnp.sum(out.astype(jnp.float32)).reshape(1), out

    tiny, big = work(m)
    jax.block_until_ready(big)

    # calibrate kernel duration with the single-sync method
    tail = jax.jit(lambda x: jnp.sum(x))
    s = tail(work(m)[0])
    float(np.asarray(s))
    t0 = time.perf_counter()
    for _ in range(4):
        o = work(m)
    s = tail(o[0])
    float(np.asarray(s))
    dur = (time.perf_counter() - t0) * 1000 / 4
    print(f"kernel duration: ~{dur:.1f} ms", flush=True)

    def rep(f, n=5):
        return min(f() for _ in range(n))

    # (a) fetch issued immediately after dispatch (production pattern)
    def a():
        t0 = time.perf_counter()
        tiny, _ = work(m)
        x = np.asarray(tiny)
        del x
        return (time.perf_counter() - t0) * 1000

    print(f"(a) np.asarray issued at dispatch: {rep(a):.1f} ms "
          f"(expect ~kernel + 1 RTT if overlapped)", flush=True)

    # (b) fetch after completion is certain (host sleep past the kernel)
    def b():
        tiny, _ = work(m)
        time.sleep(max(0.15, dur / 1000 + 0.06))
        t0 = time.perf_counter()
        x = np.asarray(tiny)
        del x
        return (time.perf_counter() - t0) * 1000

    print(f"(b) np.asarray after completion: {rep(b):.1f} ms "
          f"(pure fetch RTT)", flush=True)

    # (c) copy_to_host_async primed at dispatch
    def c():
        t0 = time.perf_counter()
        tiny, _ = work(m)
        tiny.copy_to_host_async()
        x = np.asarray(tiny)
        del x
        return (time.perf_counter() - t0) * 1000

    print(f"(c) copy_to_host_async + np.asarray: {rep(c):.1f} ms",
          flush=True)

    # (d) big-buffer fetch issued at dispatch (32 MB bf16)
    def d():
        t0 = time.perf_counter()
        _, bigo = work(m)
        x = np.asarray(bigo)
        del x
        return (time.perf_counter() - t0) * 1000

    print(f"(d) 32MB fetch issued at dispatch: {rep(d, 3):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
