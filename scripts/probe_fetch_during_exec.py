"""Does a d2h fetch of an ALREADY-COMPUTED buffer overlap the device's
execution of LATER enqueued jits?

Production shape: the record chunk jits run at the END of the device
chain; chunk 0's bytes could in principle cross the tunnel while chunks
1..3 still compute (the cchunk design premise). probe_e2e_breakdown
round 5 shows all streams landing together at device-end + RTT — this
probe isolates the link semantics:

  (a) enqueue A (~30 ms) then B (~30 ms, independent); fetch A's output
      at dispatch. Lands ~A+RTT => transfers overlap execution; lands
      ~A+B+RTT => the tunnel serves d2h only when the queue drains.
  (b) same but fetch ~10 KB (transfer cost ~0) to split readiness-wait
      from bandwidth.

Usage: python scripts/probe_fetch_during_exec.py
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

    m = jax.block_until_ready(
        jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3)

    def make_work(iters):
        @jax.jit
        def work(a):
            def body(_, x):
                return x @ a * 1e-3
            out = jax.lax.fori_loop(0, iters, body, a)
            # ~10 KB output: readiness-dominated, not bandwidth
            return out[:1, :2560].astype(jnp.float32), out
        return work

    work = make_work(20)

    # calibrate one unit with the single-sync method
    tail = jax.jit(lambda x: jnp.sum(x))
    small, big = work(m)
    jax.block_until_ready(big)
    float(np.asarray(tail(work(m)[0])))
    t0 = time.perf_counter()
    o = None
    for _ in range(4):
        o = work(m)
    float(np.asarray(tail(o[0])))
    unit = (time.perf_counter() - t0) * 1000 / 4
    print(f"unit kernel: ~{unit:.1f} ms", flush=True)

    def rep(f, n=7):
        return sorted(f() for _ in range(n))[n // 2]

    # (a) A enqueued, B enqueued behind it; fetch A's small output.
    def a():
        t0 = time.perf_counter()
        sa, _ = work(m)
        _sb, _bb = work(m)   # B: independent, queued behind A
        x = np.asarray(sa)   # fetch A's ~10 KB output
        del x
        ta = (time.perf_counter() - t0) * 1000
        jax.block_until_ready(_bb)
        return ta

    med_a = rep(a)
    print(f"(a) fetch A's 10KB with B queued behind: {med_a:.1f} ms "
          f"(~{unit:.0f}+RTT = overlapped; ~{2 * unit:.0f}+RTT = "
          f"queue-drain)", flush=True)

    # (b) control: no B queued.
    def b():
        t0 = time.perf_counter()
        sa, _ = work(m)
        x = np.asarray(sa)
        del x
        return (time.perf_counter() - t0) * 1000

    med_b = rep(b)
    print(f"(b) fetch A's 10KB, nothing queued: {med_b:.1f} ms", flush=True)
    print(f"verdict: {'OVERLAPS' if med_a < med_b + unit * 0.5 else 'QUEUE-DRAIN'}",
          flush=True)


if __name__ == "__main__":
    main()
