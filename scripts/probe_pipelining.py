"""Is the axon tunnel pipelining dispatches? Fit total(k) = a + b*k.

Methodology matters on this link (learned round 4):
  * jax.block_until_ready is a synchronous ~26 ms round trip PER CALL —
    blocking every output of a k-chain measures k RTTs, not device time
    (this poisoned the first version of this probe AND probe_tail_ab's
    per-launch numbers: 'record stage masked 137 ms/launch' was ~5 leaf
    blocks x RTT).
  * np.asarray(out) fetches the WHOLE buffer — sync through a jitted
    scalar reduce of the last output instead.
Correct form: enqueue k launches, ONE scalar sync at the end.
total(k) = a + b*k with b = true per-launch cost (device + enqueue).

Usage: python scripts/probe_pipelining.py
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

    tail = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timed_total(f, k):
        s = tail(f())
        float(np.asarray(s))  # warm
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f()
        s = tail(out)
        float(np.asarray(s))
        return (time.perf_counter() - t0) * 1000

    def sweep(name, f, ks=(1, 2, 4, 8, 16)):
        tot = {k: min(timed_total(f, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        line = " ".join(f"k={k}:{tot[k]:.1f}" for k in tot)
        print(f"{name}: {line}  ->  a={a:.1f} ms + b={b:.2f} ms/launch",
              flush=True)
        return a, b

    noop = jax.jit(lambda x: x + 1)
    resident = jax.block_until_ready(jnp.zeros((8,), jnp.int32))
    noop(resident)
    sweep("noop(resident)", lambda: noop(resident))

    m = jax.block_until_ready(jnp.zeros((4096, 4096), jnp.bfloat16))
    mm = jax.jit(lambda a_: a_ @ a_)
    mm(m)  # 4096^3*2 = 137 GFLOP ~= 0.7 ms at v5e bf16 peak
    sweep("matmul 4096^3 bf16", lambda: mm(m))

    host = np.zeros((64,), np.int32)
    sweep("put 256B", lambda: jnp.asarray(host))

    hostbig = np.zeros((1 << 20,), np.int32)  # 4 MB
    sweep("put 4MB", lambda: jnp.asarray(hostbig), ks=(1, 2, 4, 8))

    # does block_until_ready itself cost an RTT even when work is done?
    x = noop(resident)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(8):
        jax.block_until_ready(x)
    print(f"block_until_ready on READY buffer: "
          f"{(time.perf_counter() - t0) * 1000 / 8:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
