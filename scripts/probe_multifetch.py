"""10 concurrent fetches of buffers becoming ready at staggered times —
the production records pattern. probe_fetch_during_exec shows ONE fetch
of an early output lands at ready+RTT (transfers overlap later jits),
yet probe_e2e_breakdown shows all 10 production streams landing together
at device-end + RTT. This probe reproduces the fan: jits J0..J3 (~15 ms
each, serial), J0's output fetched on 4 streams, J3's on 4 more + 2 tiny,
all submitted at dispatch through the production fetch pool.

If J0's streams land at ~15+RTT the pool/link handles concurrent pending
waits fine and the production lateness is elsewhere (e.g. all record
chunks actually become ready together). If they land at ~60+RTT, pending
ready-waits serialize behind one another and chunked streaming cannot
start early no matter how the device schedule looks.

Usage: python scripts/probe_multifetch.py
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
    from disn_tpu.ops import marching as m

    print("devices:", jax.devices(), flush=True)
    a = jax.block_until_ready(jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3)

    @jax.jit
    def work(x):
        def body(_, y):
            return y @ a * 1e-3
        out = jax.lax.fori_loop(0, 14, body, x)
        # ~40 KB out0..3 (the rec-chunk size), 2 tiny
        return (out[:8, :1280].astype(jnp.float32),
                out[8:16, :1280].astype(jnp.float32),
                out[16:24, :1280].astype(jnp.float32),
                out[24:32, :1280].astype(jnp.float32),
                out[:1, :2].astype(jnp.float32), out)

    # warm
    outs = work(a)
    jax.block_until_ready(outs[-1])

    for rep in range(5):
        t0 = time.perf_counter()
        o0 = work(a)            # J0: ready ~15 ms
        o1 = work(o0[-1])       # J1
        o2 = work(o1[-1])       # J2
        o3 = work(o2[-1])       # J3: ready ~60 ms
        parts = [o0[0], o0[1], o0[2], o0[3],        # early, 40 KB each
                 o3[0], o3[1], o3[2], o3[3],        # late, 40 KB each
                 o0[4], o3[4]]                      # tiny early + late
        futs = m.records_submit(parts)
        lands = []
        for f in futs:
            f.result()
            lands.append((time.perf_counter() - t0) * 1e3)
        # landing order is futs order; report early vs late groups
        print(f"rep {rep}: early40K {['%.0f' % t for t in lands[:4]]} "
              f"late40K {['%.0f' % t for t in lands[4:8]]} "
              f"tiny(early,late) {lands[8]:.0f},{lands[9]:.0f}", flush=True)


if __name__ == "__main__":
    main()
