"""Tile-shape sweep for the fused cell-decode kernel on the real TPU.

Fine pass (fine_r=257, ~18k active cells): footprint of a stride-4 cell is
~4*137/256 ~ 2.1 px + bilinear tap -> ~4 px; production tile is (tx=8,
ty=16). Coarse pass (fine_r=65, 4096 cells): footprint ~9 px, production
(16,24). This probes tighter tiles (sampling cost scales with tile_n =
tx*ty) and cb variants, reporting per-launch slope and escape counts —
escapes go through the rescue loop in production, so a shape only wins if
its escape fraction stays small.

Usage: python scripts/probe_tile_sweep.py
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

    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import dense as dense_mod
    from disn_tpu.infer import pipeline
    from disn_tpu.infer import sparse as sparse_mod
    from disn_tpu.ops import pallas_fused

    cfg = Config(sdf_res=256, compute_dtype="bfloat16")
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
            for _ in range(4)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    pipeline._SPEC_CACHE.clear()
    for img in imgs[:3]:
        assert pipeline.image_to_mesh(params, img, trans, cfg) is not None
    ctx = pipeline._fused_dispatch(params, imgs[3], trans, sdfp, cfg,
                                   iso=cfg.iso)
    embedding, endpoints, vol_c, cell_ids, count, esc_a = ctx["pa"]
    n_active = int(np.asarray(count))
    print(f"active fine cells: {n_active} (slots {cell_ids.shape[0]})",
          flush=True)
    trans_d = ctx["trans_d"]
    sdf_d = ctx["sdf_d"]
    cd = jnp.bfloat16
    wpack = pallas_fused.pack_weights(params, endpoints["g_contrib"], cd)

    tail = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timed_total(f, k):
        s = tail(f()[0])
        float(np.asarray(s))
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f()
        s = tail(out[0])
        float(np.asarray(s))
        return (time.perf_counter() - t0) * 1000

    def sweep(name, f, ks=(1, 2, 4)):
        tot = {k: min(timed_total(f, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        out = f()
        esc = np.asarray(out[1])
        n_esc = int((esc > 0).sum())
        print(f"{name}: {b:.2f} ms/launch (+{a:.1f})  esc_cells={n_esc}",
              flush=True)
        return b, n_esc

    # ---- fine pass: the production active-cell list at fine_r=257 ----
    ids_fine = cell_ids  # padded slots decode garbage cells; same cost
    for (tx, ty, cb) in ((8, 16, 32), (8, 16, 64), (4, 16, 32), (4, 16, 64),
                         (4, 16, 128), (8, 16, 16)):
        def run(tx=tx, ty=ty, cb=cb):
            m2d = pallas_fused.prep_map(endpoints["fold137"], ty)
            return pallas_fused.fused_cell_decode(
                m2d, wpack, trans_d, sdf_d, ids_fine, stride=4, fine_r=257,
                coarse_c=64, tx_t=tx, ty_t=ty, cb=cb, img_w=137, img_h=137)
        sweep(f"fine  (tx={tx},ty={ty},cb={cb})", run)

    # ---- coarse pass: all 16^3 blocks of the 65^3 lattice ----
    ids_coarse = jnp.arange(16 ** 3, dtype=jnp.int32)
    for (tx, ty, cb) in ((16, 24, 64), (16, 24, 32), (12, 24, 64),
                         (16, 16, 64), (12, 16, 64), (8, 16, 64)):
        def run(tx=tx, ty=ty, cb=cb):
            m2d = pallas_fused.prep_map(endpoints["fold137"], ty)
            return pallas_fused.fused_cell_decode(
                m2d, wpack, trans_d, sdf_d, ids_coarse, stride=4, fine_r=65,
                coarse_c=16, tx_t=tx, ty_t=ty, cb=cb, img_w=137, img_h=137)
        sweep(f"coarse(tx={tx},ty={ty},cb={cb})", run)


if __name__ == "__main__":
    main()
