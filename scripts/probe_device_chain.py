"""Measure the production device chain stage by stage on the real TPU.

Single-sync methodology (scripts/probe_pipelining.py): enqueue k launches,
one jitted scalar reduce of the last output, fetch that scalar. Per-launch
cost = slope of total(k); every other way of timing this link lies
(block_until_ready = 1 RTT per call, np.asarray = full-buffer fetch).

Stages: phase_a (encode+fold+coarse+cull), _run_pbm (fine kernel + scan +
scatter), record stage (compact + masked), and the full chain.

Usage: python scripts/probe_device_chain.py
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
            for _ in range(4)]
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    # warm the spec cache, grab a production ctx
    pipeline._SPEC_CACHE.clear()
    for img in imgs[:3]:
        assert pipeline.image_to_mesh(params, img, trans, cfg) is not None
    ctx = pipeline._fused_dispatch(params, imgs[3], trans, sdfp, cfg,
                                   iso=cfg.iso)
    assert ctx["pred"] is not None
    for f in ctx["futs"]:
        f.result()
    nb_p, ni_p, batch_p = ctx["pred"]
    nv_p = pipeline._SPEC_CACHE[ctx["key"]][2]
    assert nv_p is not None, "rerun: warm images must cover the scan"
    nvcap = m._qbucket(max(4, int(nv_p * 1.15)))
    iso = float(cfg.iso)

    pa = sparse_mod._phase_a_jit(cfg, cfg.sparse_stride, ctx["block"],
                                 cfg.cell_cap_frac, cfg.band_factor)
    img_d = jax.block_until_ready(jnp.asarray(imgs[3]))
    trans_d, sdf_d = ctx["trans_d"], ctx["sdf_d"]

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

    def sweep(name, f, last=lambda o: o[0], ks=(1, 2, 4, 8)):
        tot = {k: min(timed_total(f, last, k) for _ in range(3)) for k in ks}
        karr = np.asarray(list(tot))
        tarr = np.asarray([tot[k] for k in tot])
        b, a = np.polyfit(karr, tarr, 1)
        line = " ".join(f"k={k}:{tot[k]:.1f}" for k in tot)
        print(f"{name}: {line}  ->  {b:.2f} ms/launch (+{a:.1f})",
              flush=True)
        return b

    t_pa = sweep("phase_a", lambda: pa(params, img_d, trans_d, sdf_d),
                 last=lambda o: o[0])

    pa_out = pa(params, img_d, trans_d, sdf_d)
    ctx2 = dict(ctx)
    ctx2["pa"] = pa_out
    t_pbm = sweep("pbm (fine kernel+scan+scatter)",
                  lambda: pipeline._run_pbm(ctx2, nb_p),
                  last=lambda o: o[0])

    vol, esc_b, ids, ncd, gov_d, blk_d = pipeline._run_pbm(ctx2, nb_p)
    _, _, _, _, count, esc_a = pa_out
    scalars = (count, esc_a, esc_b, ncd, gov_d)
    t_rc = sweep("records compact",
                 lambda: m._records_compact_split(
                     vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p,
                     nvcap=nvcap, scalars=scalars),
                 last=lambda o: o[4])
    t_rm = sweep("records masked",
                 lambda: m._records_masked_split(
                     vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p,
                     scalars=scalars),
                 last=lambda o: o[4])

    def full():
        pa_o = pa(params, img_d, trans_d, sdf_d)
        c2 = dict(ctx)
        c2["pa"] = pa_o
        vol, esc_b, ids, ncd, gov_d, blk_d = pipeline._run_pbm(c2, nb_p)
        sc = (pa_o[4], pa_o[5], esc_b, ncd, gov_d)
        return m._records_compact_split(vol, ids, ncd, iso=iso,
                                        n_iter=ni_p, batch=batch_p,
                                        nvcap=nvcap, scalars=sc)

    t_full = sweep("FULL device chain", full, last=lambda o: o[4],
                   ks=(1, 2, 4))
    print(f"sum of stages: {t_pa + t_pbm + t_rc:.1f} ms  "
          f"(pa {t_pa:.1f} + pbm {t_pbm:.1f} + rec {t_rc:.1f}; "
          f"masked rec {t_rm:.1f})", flush=True)


if __name__ == "__main__":
    main()
