"""Ablate the bitpacked candidate scan (_active_cells_from_coarse) on TPU.

Hypothesis (round 4b): of the ~6.1 ms scan, ~4.5 is the final id-list
scatter — 640k rows (b2cap x 64 slot domain) at the ~7 ns/row scatter law,
with only ~nc real. Measures the full scan vs a variant cut after the
change-block compaction (no per-cell expansion/scatter), and the compact
record stage for context.

Single-sync methodology of scripts/probe_device_chain.py.
Usage: python scripts/probe_scan_parts.py
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
    from disn_tpu.infer import pipeline, sparse as sparse_mod
    from disn_tpu.ops import marching as m

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
            for _ in range(3)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    pipeline._SPEC_CACHE.clear()
    for img in imgs[:2]:
        assert pipeline.image_to_mesh(params, img, trans, cfg) is not None
    ctx = pipeline._fused_dispatch(params, imgs[2], trans, sdfp, cfg,
                                   iso=cfg.iso)
    for f in ctx["futs"]:
        f.result()
    nb_p = ctx["pred"][0]
    pa = sparse_mod._phase_a_jit(cfg, cfg.sparse_stride, ctx["block"],
                                 cfg.cell_cap_frac, cfg.band_factor)
    pa_out = pa(params, jnp.asarray(imgs[2]), ctx["trans_d"], ctx["sdf_d"])
    _, _, _, cell_ids, count, _ = pa_out
    # a finished volume to scan (run the plain phase_b, no scan)
    pb = sparse_mod._phase_b_jit(cfg, cfg.sparse_stride, ctx["block"],
                                 cfg.cell_cap_frac, cfg.band_factor, nb_p)
    vol, _ = pb(params, *pa_out[:5], ctx["trans_d"], ctx["sdf_d"])
    vol = jax.block_until_ready(vol)
    iso = float(cfg.iso)
    bcap = pipeline._fused_bcap(nb_p, ctx["sizes"])
    stride = cfg.sparse_stride

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

    ids, ncd, gov, blk = m._active_cells_from_coarse(
        vol, cell_ids, count, iso=iso, stride=stride, bcap=bcap)
    print(f"nc={int(ncd)} gov={int(gov)} ids_len={ids.shape[0]} "
          f"blk_rows={blk.shape[0]}", flush=True)

    t_full = sweep("scan FULL",
                   lambda: m._active_cells_from_coarse(
                       vol, cell_ids, count, iso=iso, stride=stride,
                       bcap=bcap),
                   last=lambda o: o[0])

    # change bits + bitpack + block compaction only (no per-cell expansion)
    src = m._active_cells_from_coarse.__wrapped__
    import inspect
    # re-derive the prefix inline (keep in sync with marching.py)
    R = int(vol.shape[0])
    S = stride
    cgrid = (R - 1) // S
    B3 = cgrid + 1
    b2cap = max(512, -(-(bcap // 2) // 256) * 256)

    @jax.jit
    def scan_prefix(vol, cell_ids, count):
        change = m._sign_change_cells(vol, iso)
        Ep = B3 * S
        ch = jnp.pad(change, ((0, Ep - R),) * 3)
        f32 = jnp.float32
        xs = np.arange(Ep)
        wx = np.zeros((Ep, B3), np.float32)
        wx[xs, xs // S] = 2.0 ** (xs % S)
        wy = np.zeros((Ep, B3), np.float32)
        wy[xs, xs // S] = (2.0 ** S) ** (xs % S)
        a = jnp.dot(ch.reshape(Ep * Ep, Ep).astype(f32), jnp.asarray(wx),
                    preferred_element_type=f32).reshape(Ep, Ep, B3)
        b = jax.lax.dot_general(a, jnp.asarray(wy),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        bi = b.transpose(0, 2, 1).astype(jnp.int32).reshape(B3, S, B3, B3)
        s2 = S * S
        blo = jnp.zeros_like(bi[:, 0])
        bhi = jnp.zeros_like(bi[:, 0])
        for zl in range(S):
            bit0 = zl * s2
            if bit0 + s2 <= 32:
                blo = blo | (bi[:, zl] << bit0)
            else:
                bhi = bhi | (bi[:, zl] << (bit0 - 32))
        bits = jnp.stack([blo.reshape(-1), bhi.reshape(-1)], axis=-1)
        n_slots = cell_ids.shape[0]
        valid = jnp.arange(n_slots, dtype=jnp.int32) < count
        act = jnp.zeros((cgrid ** 3,), bool).at[
            jnp.where(valid, cell_ids, cgrid ** 3)].set(True, mode="drop")
        cand = jnp.pad(act.reshape(cgrid, cgrid, cgrid), ((0, 1),) * 3,
                       mode="edge").reshape(-1)
        sel = cand & ((bits[:, 0] | bits[:, 1]) != 0)
        bcs = jnp.cumsum(sel.astype(jnp.int32))
        bidx = jnp.where(sel, bcs - 1, b2cap)
        bids = jnp.zeros((b2cap,), jnp.int32).at[bidx].set(
            jnp.arange(B3 ** 3, dtype=jnp.int32), mode="drop")
        rbits = jnp.take(bits, bids, axis=0)
        return bids, rbits, bcs[-1]

    t_pre = sweep("scan prefix (bits+block compaction, no id expansion)",
                  lambda: scan_prefix(vol, cell_ids, count),
                  last=lambda o: o[1])
    print(f"\n=> id expansion/scatter costs ~{t_full - t_pre:.2f} ms "
          f"(domain {b2cap}x{S ** 3} = {b2cap * S ** 3} rows)", flush=True)


if __name__ == "__main__":
    main()
