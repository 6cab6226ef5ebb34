"""Ablate phase_a on the real TPU: where do the 15.7 ms go?

phase_a = prep (encode+fold137) + coarse pass (dense_grid_via_cells:
fused kernel over 4096 cells + escape-rescue cond + BOUNDARY PLANES via the
XLA decode padded to plane_block=65536 when only 3*65^2 = 12,675 points are
real) + band cull. Round-3 recorded "coarse kernel 10.7 ms at ~26M pts/s vs
fine 33M" — hypothesis: the missing 35% is the 65536-point XLA plane decode
(4-tap map gathers, ~30 ns/row), not the kernel.

Single-sync methodology of scripts/probe_device_chain.py.

Usage: python scripts/probe_phase_a.py
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
    from disn_tpu.infer import fused as fused_mod
    from disn_tpu.infer import sparse as sparse_mod
    from disn_tpu.ops import pallas_fused

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32))
    trans = jnp.asarray(synthetic.demo_trans_mat())
    sdfp = jnp.asarray(np.array([-1, -1, -1, 1, 1, 1], np.float32))

    stride = cfg.sparse_stride
    fine_r = cfg.grid_resolution
    rc = (fine_r - 1) // stride + 1         # 65 = the coarse LATTICE
    c = (rc - 1) // fused_mod.STRIDE         # 16 kernel cells/axis at rc
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    tx_t, ty_t, cb = fused_mod.tiles_for(rc)
    interpret = jax.default_backend() != "tpu"

    tail = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timed_total(f, last, k):
        s = tail(last(f()))
        float(np.asarray(s))
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f()
        s = tail(last(out))
        float(np.asarray(s))
        return (time.perf_counter() - t0) * 1000

    def sweep(name, f, last=lambda o: o, ks=(1, 2, 4, 8)):
        tot = {k: min(timed_total(f, last, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        line = " ".join(f"k={k}:{tot[k]:.1f}" for k in tot)
        print(f"{name}: {line}  ->  {b:.2f} ms/launch (+{a:.1f})",
              flush=True)
        return b

    # ---- prep (encode + fold137) ----
    prep = jax.jit(lambda p, im: dense_mod._prep(p, im, cfg,
                                                 fold_local="137"))
    t_prep = sweep("prep (encode+fold)", lambda: prep(params, img),
                   last=lambda o: o[1]["fold137"])

    embedding, endpoints = prep(params, img)
    m2d = jax.block_until_ready(
        pallas_fused.prep_map(endpoints["fold137"], ty_t))
    wpack = pallas_fused.pack_weights(params, endpoints["g_contrib"], cd)
    wpack = jax.block_until_ready(wpack)
    geom = jax.block_until_ready(sdfp.astype(jnp.float32))
    all_cells = jnp.arange(c ** 3, dtype=jnp.int32)

    # ---- raw kernel (no rescue, no planes): 4096 cells x 64 pts ----
    def raw_kernel():
        return pallas_fused.fused_cell_decode(
            m2d, wpack, trans, geom, all_cells, stride=stride, fine_r=rc,
            coarse_c=c, tx_t=tx_t, ty_t=ty_t, cb=cb,
            img_w=cfg.img_w, img_h=cfg.img_h, out_dim=1,
            interpret=interpret)

    t_raw = sweep("coarse kernel RAW (4096 cells)", raw_kernel,
                  last=lambda o: o[0])
    _, esc = raw_kernel()
    n_esc = int(jnp.sum((esc > 0).astype(jnp.int32)))
    print(f"  escaped cells: {n_esc}/{c ** 3}", flush=True)

    # ---- decode_cells (kernel + rescue cond + scale) ----
    dc = jax.jit(lambda p, e, t, s: fused_mod.decode_cells(
        p, e, t, s, all_cells, cfg, fine_r=rc, coarse_c=c))
    t_dc = sweep("decode_cells (kernel+rescue)",
                 lambda: dc(params, endpoints, trans, sdfp),
                 last=lambda o: o[0])

    # ---- boundary planes via the XLA path, padded vs tight block ----
    n_plane = rc * rc

    def make_planes(pb):
        total = -(-3 * n_plane // pb) * pb

        @jax.jit
        def planes(p, e, t, s):
            def plane(i):
                q = i * pb + jnp.arange(pb, dtype=jnp.int32)
                which = q // n_plane
                r = q % n_plane
                a = r // rc
                b = r % rc
                last_ = rc - 1
                fx = jnp.where(which == 2, last_, b)
                fy = jnp.where(which == 0, a,
                               jnp.where(which == 1, last_, b))
                fz = jnp.where(which == 0, last_, a)
                denom = jnp.float32(rc - 1)
                lo = s[0:3]
                hi = s[3:6]
                pts = jnp.stack([
                    lo[0] + fx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
                    lo[1] + fy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
                    lo[2] + fz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
                ], axis=-1)
                v = dense_mod._decode_block(p, e, None, t, pts, cfg,
                                            folded="137")
                return v

            return jax.lax.map(plane, jnp.arange(total // pb,
                                                 dtype=jnp.int32))

        return planes

    planes_big = make_planes(65536)
    t_pl_big = sweep("planes XLA (block=65536, 1 blk)",
                     lambda: planes_big(params, endpoints, trans, sdfp))
    pb_tight = -(-3 * n_plane // 256) * 256
    planes_tight = make_planes(pb_tight)
    t_pl_tight = sweep(f"planes XLA (block={pb_tight}, 1 blk)",
                       lambda: planes_tight(params, endpoints, trans, sdfp))

    # ---- planes via the KERNEL: decode the 3 boundary planes as one extra
    # ring of cells (cells at cx==c-1 etc. already include plane points?
    # No: plane fx = fine_r-1 = c*stride is OUTSIDE every cell. Decode a
    # synthetic "plane lattice" instead: treat each plane as cells of a
    # shifted lattice is not expressible; just measure the tight block. ----

    # ---- full coarse: dense_grid_via_cells as shipped ----
    dgc = jax.jit(lambda p, e, t, s: fused_mod.dense_grid_via_cells(
        p, e, t, s, rc, cfg, plane_block=65536))
    t_dgc = sweep("dense_grid_via_cells (shipped)",
                  lambda: dgc(params, endpoints, trans, sdfp),
                  last=lambda o: o[0])

    # ---- cull (band_tau + active_cells) ----
    vol_c, _ = dgc(params, endpoints, trans, sdfp)
    vol_c = jax.block_until_ready(vol_c)
    n_cells = c ** 3
    cell_cap = max(256, int(n_cells * cfg.cell_cap_frac))

    @jax.jit
    def cull(v, s):
        tau = sparse_mod._band_tau(v, s, rc, cfg.band_factor, cfg)
        return sparse_mod._active_cells(v, tau, cell_cap)

    t_cull = sweep("cull (band_tau+active_cells)", lambda: cull(vol_c, sdfp),
                   last=lambda o: o[0])

    print(f"\nphase_a decomposition: prep {t_prep:.1f} + coarse "
          f"(raw kernel {t_raw:.1f} / +rescue {t_dc:.1f} / planes "
          f"{t_pl_big:.1f} big vs {t_pl_tight:.1f} tight) + cull {t_cull:.1f}"
          f"\nshipped dense_grid_via_cells {t_dgc:.1f} "
          f"(= decode_cells + planes-big + scatter)", flush=True)


if __name__ == "__main__":
    main()
