"""Link health probe: separate PUT cost from DISPATCH cost on the axon
tunnel.

Round-4 anomaly: probe_records.py measured a 29 ms/launch noop floor —
but its noop lambda creates a fresh jnp.zeros per call (a host->device put
per launch). This probe chains (a) noop on a device-resident buffer,
(b) noop on a fresh host array per call, (c) pure puts, so a congested
link can be told apart from per-dispatch round trips.

Usage: python scripts/probe_link.py
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

    noop = jax.jit(lambda x: x + 1)
    resident = jax.block_until_ready(jnp.zeros((8,), jnp.int32))
    noop(resident)

    def chain1(f, k=16):
        outs = [f() for _ in range(k)]
        for o in outs:
            jax.block_until_ready(o)
        x = float(np.asarray(outs[-1]).reshape(-1).view(np.uint8)[0])
        del x
        t0 = time.perf_counter()
        outs = [f() for _ in range(k)]
        for o in outs:
            jax.block_until_ready(o)
        x = float(np.asarray(outs[-1]).reshape(-1).view(np.uint8)[0])
        del x
        return (time.perf_counter() - t0) * 1000 / k

    def best(f, reps=3, k=16):
        return min(chain1(f, k) for _ in range(reps))

    a = best(lambda: noop(resident))
    print(f"noop on device-resident buffer: {a:.2f} ms/launch", flush=True)

    host = np.zeros((8,), np.int32)
    b = best(lambda: noop(jnp.asarray(host)))
    print(f"noop on fresh host array (put+dispatch): {b:.2f} ms/launch",
          flush=True)

    c = best(lambda: jnp.asarray(host))
    print(f"pure put (8 B): {c:.2f} ms/launch", flush=True)

    # one full round trip for scale
    t0 = time.perf_counter()
    for i in range(8):
        float(np.asarray(noop(resident))[i % 8])
    rtt = (time.perf_counter() - t0) * 1000 / 8
    print(f"sync round trip (dispatch+fetch scalar): {rtt:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
