"""A/B probe for the round-3 tail work on the real TPU.

Measures the production image->mesh path in three configurations over the
same analytic-octahedron workload (fresh image per rep, median wall clock):
  A. masked stream, NO optimistic assembly (round-3-early behavior)
  B. masked stream + optimistic assembly
  C. compact tq  + optimistic assembly (default)
and reports the device cost of the compact-tq scatter separately (chained
record-stage launches, one sync, noop RTT subtracted) so the
compact-vs-masked call can be made on data: the compaction trades ~45%
fewer record bytes against a [slots*D]-row scatter (~30 ns/row on TPU).

Usage: python scripts/probe_tail_ab.py [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def median_ms(fn, imgs):
    ts = []
    for img in imgs:
        t0 = time.perf_counter()
        fn(img)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000.0)


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9

    from disn_tpu.config import Config
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = Config(sdf_res=256, compute_dtype="bfloat16") if on_tpu else \
        Config(sdf_res=32, compute_dtype="float32", num_classes=64,
               width_mult=0.125)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(1, cfg.img_h, cfg.img_w, 3).astype(np.float32)
            for _ in range(reps + 3)]
    trans = synthetic.demo_trans_mat()

    def run(cfg_v, tag):
        pipeline._SPEC_CACHE.clear()
        for img in imgs[:3]:  # compile + seed + first spec exec
            pipeline.image_to_mesh(params, img, trans, cfg_v)
        ms = median_ms(
            lambda im: pipeline.image_to_mesh(params, im, trans, cfg_v),
            imgs[3:])
        print(f"{tag}: {ms:.1f} ms", flush=True)
        return ms

    # C. compact tq + optimistic assembly (opt-in since compact_tq
    # defaulted off pending this A/B)
    run(cfg.replace(compact_tq=True), "C compact+opt")
    # B. masked stream + optimistic assembly (the current default)
    run(cfg.replace(compact_tq=False), "B masked+opt")
    # A. masked, optimistic assembly bypassed (join exact path): emulate by
    # clearing the opt future before collect
    from disn_tpu.ops import marching as m
    orig = m.records_assemble_speculative

    def no_opt(futs, sdf_params, R, mode, nvcap=None):
        fut, cancel = orig(futs, sdf_params, R, mode, nvcap)
        cancel.set()  # worker bails before assembling; collect joins exact
        return fut, cancel

    m.records_assemble_speculative = no_opt
    try:
        run(cfg.replace(compact_tq=False), "A masked no-opt")
    finally:
        m.records_assemble_speculative = orig

    # device cost of the record stage alone, masked vs compact (chained)
    if on_tpu:
        # re-warm the spec cache under the DEFAULT cfg key (the runs above
        # ended on the compact_tq=False variant, whose Config hashes
        # differently, so a dispatch with `cfg` would find no prediction)
        pipeline._SPEC_CACHE.clear()
        sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
        for img in imgs[:2]:
            pipeline.image_to_mesh(params, img, trans, cfg)
        ctx = pipeline._fused_dispatch(params, imgs[2], trans, sdfp, cfg,
                                       iso=cfg.iso)
        out = pipeline._fused_collect(ctx)
        assert out is not None
        ctx = pipeline._fused_dispatch(params, imgs[3], trans, sdfp, cfg,
                                       iso=cfg.iso)
        if ctx["pred"] is not None:
            vol, esc_b, ids, ncd, gov_d = ctx["pbm"]
            nb_p, ni_p, batch_p = ctx["pred"]
            nv_p = pipeline._SPEC_CACHE[ctx["key"]][2]
            if nv_p is None:
                # _update_pred clears nv when a warm image's record slots
                # under-covered the scan — the compact chain is undefined
                print("nv unpredicted; skipping record-stage device A/B")
                return
            nvcap = m._qbucket(max(4, int(nv_p * 1.15)))

            def chain(f, k=8):
                outs = [f() for _ in range(k)]
                t0 = time.perf_counter()
                for o in outs:
                    jax.block_until_ready(o)
                x = float(np.asarray(outs[-1][0]).view(np.uint8)[0])  # sync
                del x
                return (time.perf_counter() - t0) * 1000 / k

            fm = lambda: m._records_masked_split(  # noqa: E731
                vol, ids, ncd, iso=float(cfg.iso), n_iter=ni_p,
                batch=batch_p)
            fc = lambda: m._records_compact_split(  # noqa: E731
                vol, ids, ncd, iso=float(cfg.iso), n_iter=ni_p,
                batch=batch_p, nvcap=nvcap)
            fm(); fc()  # compile
            print(f"record stage masked:  {chain(fm):.2f} ms/launch")
            print(f"record stage compact: {chain(fc):.2f} ms/launch "
                  f"(delta = compaction scatter cost)")


if __name__ == "__main__":
    main()
