"""Dense-precompute record stage probe.

probe_recstage_slope showed the record stage is GATHER-bound: 8 scalar
corner gathers x ~82k slots ~ 656k rows ~ 9.3 ms of the 10.5 ms stage.
This probe measures the dense alternative: compute imask + the 7 owned-edge
t parameters DENSELY over the whole volume (fused shifted slice reads, no
8-minor stack — per-cell data packed into two flat u32 words by integer
arithmetic), then gather ONE or TWO packed words per record slot
(82k/164k rows instead of 656k).

Variants:
  ref       : current _extract_records (8 scalar gathers per slot)
  dense     : the packed dense build alone (w0, w1 u32 [E^3])
  dense+2g  : dense build + two scalar gathers (w0, w1 separate)
  dense+1g  : dense build + [E^3,2] interleave + one row gather
  full      : dense + gather + rec/cross assembly + compact (vs
              _records_compact_split)

Also asserts the dense path's (rec, tq) match _extract_records exactly.

Usage: python scripts/probe_dense_records.py
"""
from __future__ import annotations

import functools
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
    from disn_tpu.infer import pipeline
    from disn_tpu.ops import marching as m

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
            for _ in range(4)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    pipeline._SPEC_CACHE.clear()
    for i, img in enumerate(imgs[:3]):
        t0 = time.perf_counter()
        assert pipeline.image_to_mesh(params, img, trans, cfg) is not None
        print(f"warm-up {i}: {time.perf_counter() - t0:.1f}s", flush=True)
    ctx = pipeline._fused_dispatch(params, imgs[3], trans, sdfp, cfg,
                                   iso=cfg.iso)
    assert ctx["pred"] is not None
    for f in ctx["futs"]:
        f.result()
    vol, esc_b, ids, ncd, gov_d = ctx["pbm"]
    nb_p, ni_p, batch_p = ctx["pred"]
    nv_p = pipeline._SPEC_CACHE[ctx["key"]][2]
    assert nv_p is not None
    nvcap = m._qbucket(max(4, int(nv_p * 1.15)))
    iso = float(cfg.iso)
    R = vol.shape[0]
    E = R
    S = ni_p * batch_p
    print(f"R={R} slots={S} nvcap={nvcap}", flush=True)

    pair_i_np, pair_j_np, _, _ = m._owned_tables()
    D = len(pair_i_np)
    offs = m.CORNERS[pair_j_np]          # [D, 3] all from corner 0
    bad = np.asarray((m.CORNERS[pair_i_np] | m.CORNERS[pair_j_np]) > 0)

    def dense_pack(volume):
        """(w0, w1) u32 [E^3]: w0 = tq0..tq3, w1 = tq4..tq6 | imask<<24."""
        vp = jnp.pad(volume, ((0, 1),) * 3, mode="edge")

        def sh(ox, oy, oz):
            return jax.lax.slice(vp, (oz, oy, ox), (oz + E, oy + E, ox + E))

        v0 = sh(0, 0, 0)
        imask = (v0 < iso).astype(jnp.int32)  # corner 0 = bit 0
        tq = []
        for d in range(D):
            ox, oy, oz = offs[d].tolist()
            vj = sh(ox, oy, oz)
            k = int(np.nonzero((m.CORNERS == offs[d]).all(1))[0][0])
            imask = imask | ((vj < iso).astype(jnp.int32) << k)
            dv = vj - v0
            t = jnp.where(jnp.abs(dv) > 1e-12, (iso - v0) / dv, 0.5)
            t = jnp.clip(t, 0.0, 1.0)
            tq.append(jnp.round(t * 255.0).astype(jnp.int32))
        w0 = (tq[0] | (tq[1] << 8) | (tq[2] << 16) | (tq[3] << 24))
        w1 = (tq[4] | (tq[5] << 8) | (tq[6] << 16) | (imask << 24))
        return w0.reshape(-1), w1.reshape(-1)

    slot_i = jnp.arange(S, dtype=jnp.int32)
    badj = jnp.asarray(bad)

    def gather_records(w0, w1, cell_ids, n_cells):
        cids = jax.lax.slice_in_dim(cell_ids, 0, S)
        r0 = jnp.take(w0, cids)
        r1 = jnp.take(w1, cids)
        imask = (r1 >> 24) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFF, (r0 >> 8) & 0xFF,
                        (r0 >> 16) & 0xFF, (r0 >> 24) & 0xFF,
                        (r1 >> 0) & 0xFF, (r1 >> 8) & 0xFF,
                        (r1 >> 16) & 0xFF], axis=-1).astype(jnp.uint8)
        in_range = slot_i < n_cells
        cz = cids // (E * E)
        cy = (cids // E) % E
        cx = cids % E
        ghost = jnp.stack([cx == R - 1, cy == R - 1, cz == R - 1], axis=-1)
        aliased = jnp.any(ghost[:, None, :] & badj[None, :, :], axis=-1)
        bit0 = imask & 1
        bitj = (imask[:, None] >> jnp.asarray(pair_j_np)[None, :]) & 1
        cross = (bit0[:, None] != bitj) & in_range[:, None] & ~aliased
        imask = jnp.where(in_range, imask, 0)
        cmask = jnp.sum(cross.astype(jnp.int32)
                        * (1 << jnp.arange(D, dtype=jnp.int32))[None, :],
                        axis=1)
        rec = ((cmask << 8) | imask).astype(jnp.uint16)
        return rec, tq

    def gather_records_1g(w01, cell_ids, n_cells):
        cids = jax.lax.slice_in_dim(cell_ids, 0, S)
        r = jnp.take(w01, cids, axis=0)  # [S, 2] aligned row gather
        r0, r1 = r[:, 0], r[:, 1]
        imask = (r1 >> 24) & 0xFF
        tq = jnp.stack([(r0 >> 0) & 0xFF, (r0 >> 8) & 0xFF,
                        (r0 >> 16) & 0xFF, (r0 >> 24) & 0xFF,
                        (r1 >> 0) & 0xFF, (r1 >> 8) & 0xFF,
                        (r1 >> 16) & 0xFF], axis=-1).astype(jnp.uint8)
        in_range = slot_i < n_cells
        cz = cids // (E * E)
        cy = (cids // E) % E
        cx = cids % E
        ghost = jnp.stack([cx == R - 1, cy == R - 1, cz == R - 1], axis=-1)
        aliased = jnp.any(ghost[:, None, :] & badj[None, :, :], axis=-1)
        bit0 = imask & 1
        bitj = (imask[:, None] >> jnp.asarray(pair_j_np)[None, :]) & 1
        cross = (bit0[:, None] != bitj) & in_range[:, None] & ~aliased
        imask = jnp.where(in_range, imask, 0)
        cmask = jnp.sum(cross.astype(jnp.int32)
                        * (1 << jnp.arange(D, dtype=jnp.int32))[None, :],
                        axis=1)
        rec = ((cmask << 8) | imask).astype(jnp.uint16)
        return rec, tq

    # ---- correctness vs the production extractor ----------------------
    rec_ref, tq_ref = jax.jit(lambda: m._extract_records(
        vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p))()
    rec_ref = np.asarray(rec_ref)
    tq_ref = np.asarray(tq_ref)

    @jax.jit
    def dense_full():
        w0, w1 = dense_pack(vol)
        return gather_records(w0, w1, ids, ncd)

    rec_d, tq_d = dense_full()
    rec_d = np.asarray(rec_d)
    tq_d = np.asarray(tq_d)
    ok_rec = np.array_equal(rec_ref, rec_d)
    # tq of non-crossing edges is garbage-but-deterministic in both paths;
    # require equality on CROSSING edges (what ships) and report raw equality
    cross_ref = ((rec_ref.astype(np.int32)[:, None]
                  >> (8 + np.arange(D))) & 1) > 0
    ok_tq_cross = np.array_equal(tq_ref[cross_ref], tq_d[cross_ref])
    ok_tq_all = np.array_equal(tq_ref, tq_d)
    print(f"correctness: rec {'OK' if ok_rec else 'MISMATCH'}, "
          f"tq@cross {'OK' if ok_tq_cross else 'MISMATCH'}, "
          f"tq@all {'OK' if ok_tq_all else 'mismatch (non-shipping)'}",
          flush=True)
    if not (ok_rec and ok_tq_cross):
        sys.exit(1)

    # ---- timing --------------------------------------------------------
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

    def sweep(name, f, last, ks=(1, 2, 4, 8)):
        tot = {k: min(timed_total(f, last, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        print(f"{name}: {b:.2f} ms/launch (+{a:.1f})", flush=True)
        return b

    sweep("ref _extract_records",
          jax.jit(lambda: m._extract_records(vol, ids, ncd, iso=iso,
                                             n_iter=ni_p, batch=batch_p)),
          lambda o: o[0])

    dense_jit = jax.jit(lambda: dense_pack(vol))
    sweep("dense build alone", dense_jit, lambda o: o[0])

    sweep("dense + 2 scalar gathers", dense_full, lambda o: o[0])

    @jax.jit
    def dense_1g():
        w0, w1 = dense_pack(vol)
        w01 = jnp.stack([w0, w1], axis=-1)
        return gather_records_1g(w01, ids, ncd)

    rec_1, tq_1 = dense_1g()
    assert np.array_equal(np.asarray(rec_1), rec_ref)
    sweep("dense + interleave + 1 row gather", dense_1g, lambda o: o[0])

    # gather stage alone (dense inputs precomputed)
    w0_c, w1_c = dense_jit()
    w0_c = jax.block_until_ready(w0_c)
    w1_c = jax.block_until_ready(w1_c)
    sweep("2 scalar gathers alone",
          jax.jit(lambda: gather_records(w0_c, w1_c, ids, ncd)),
          lambda o: o[0])

    # full stage: dense + gather + count + compact (one jit), vs production
    @jax.jit
    def full_compact():
        w0, w1 = dense_pack(vol)
        rec, tq = gather_records(w0, w1, ids, ncd)
        nv = m._count_cross(rec)
        tqc, _ = m._compact_tq(rec, tq, nvcap)
        return nv, rec, tqc

    sweep("FULL dense+gather+count+compact", full_compact, lambda o: o[0])

    _, _, _, _, count, esc_a = ctx["pa"]
    scalars = (count, esc_a, esc_b, ncd, gov_d)
    sweep("FULL production _records_compact_split",
          jax.jit(lambda: m._records_compact_split(
              vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p,
              nvcap=nvcap, scalars=scalars)), lambda o: o[4])


if __name__ == "__main__":
    main()
