"""Slope-methodology ablation of the one-dispatch record stage.

probe_device_chain measured the compact record stage at 10.5 ms/launch
(masked 6.5) while probe_records' floor-subtracted parts summed to ~2.3 —
this probe re-measures each part with the robust total(k)=a+b*k fit:
_extract_records, + crossing count, + compaction, + fetch splits, + flags,
for both modes.

Usage: python scripts/probe_recstage_slope.py
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
    for img in imgs[:3]:
        assert pipeline.image_to_mesh(params, img, trans, cfg) is not None
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
    _, _, _, _, count, esc_a = ctx["pa"]
    scalars = (count, esc_a, esc_b, ncd, gov_d)

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

    rec_fn = jax.jit(lambda: m._extract_records(vol, ids, ncd, iso=iso,
                                                n_iter=ni_p, batch=batch_p))
    sweep("_extract_records", rec_fn, lambda o: o[0])

    rec, tq = rec_fn()
    rec = jax.block_until_ready(rec)
    tq = jax.block_until_ready(tq)
    sweep("_count_cross", jax.jit(lambda: m._count_cross(rec)),
          lambda o: o)
    sweep("_compact_tq", jax.jit(lambda: m._compact_tq(rec, tq, nvcap)),
          lambda o: o)

    @jax.jit
    def extract_count():
        rec, tq = m._extract_records(vol, ids, ncd, iso=iso, n_iter=ni_p,
                                     batch=batch_p)
        return m._count_cross(rec), rec, tq

    sweep("extract+count (one jit)", extract_count, lambda o: o[0])

    @jax.jit
    def extract_count_compact():
        rec, tq = m._extract_records(vol, ids, ncd, iso=iso, n_iter=ni_p,
                                     batch=batch_p)
        nv = m._count_cross(rec)
        tqc = m._compact_tq(rec, tq, nvcap)
        return nv, rec, tqc

    sweep("extract+count+compact (one jit)", extract_count_compact,
          lambda o: o[0])

    sweep("FULL _records_compact_split",
          jax.jit(lambda: m._records_compact_split(
              vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p,
              nvcap=nvcap, scalars=scalars)), lambda o: o[4])
    sweep("FULL _records_masked_split",
          jax.jit(lambda: m._records_masked_split(
              vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p,
              scalars=scalars)), lambda o: o[4])


if __name__ == "__main__":
    main()
