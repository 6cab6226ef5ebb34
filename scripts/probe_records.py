"""Component ablation of the record stage on the real TPU.

The round-4 A/B (scripts/probe_tail_ab.py) measured the one-dispatch record
stage at ~32-37 ms/launch — 5x the old breakdown's estimate and the second-
largest device cost after the fused fine kernel. This probe splits it:

  * _extract_records alone, at batch 4096 (production) and wider batches
    (the lax.map over batches serializes; each batch is 8 scalar-row
    gathers + VPU math — is the cost gather rows or map overhead?)
  * _count_cross / _compact_tq / the fetch-split slicing, separately
  * raw gather calibration: jnp.take of N scalar rows from the padded
    volume (ns/row at production index counts)

Workload: the same analytic-octahedron production image the tail A/B uses
(real vol/ids/counts from a production dispatch).

Usage: python scripts/probe_records.py
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
        out = pipeline.image_to_mesh(params, img, trans, cfg)
        assert out is not None
    ctx = pipeline._fused_dispatch(params, imgs[3], trans, sdfp, cfg,
                                   iso=cfg.iso)
    assert ctx["pred"] is not None
    for f in ctx["futs"]:
        f.result()
    vol, esc_b, ids, ncd, gov_d = ctx["pbm"]
    nb_p, ni_p, batch_p = ctx["pred"]
    nv_p = pipeline._SPEC_CACHE[ctx["key"]][2]
    if nv_p is None:
        # _update_pred clears nv when a warm image's record slots
        # under-covered the scan — every chain below depends on nvcap
        print("nv unpredicted after warm-up; cannot size the compact "
              "chains — rerun (warm images must cover the scan)")
        sys.exit(1)
    nvcap = m._qbucket(max(4, int(nv_p * 1.15)))
    nc = int(np.asarray(ncd))
    print(f"ids={ids.shape[0]} n_cells={nc} n_iter={ni_p} "
          f"batch={batch_p} slots={ni_p * batch_p} nv~{nv_p} nvcap={nvcap}",
          flush=True)

    def chain1(f, k):
        outs = [f() for _ in range(k)]
        t0 = time.perf_counter()
        for o in outs:
            jax.block_until_ready(o)
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        x = float(np.asarray(leaf).reshape(-1).view(np.uint8)[0])
        del x
        return (time.perf_counter() - t0) * 1000 / k

    def chain(f, k=8, reps=3):
        # min over reps: tunnel congestion only ADDS time, so the min is
        # the best estimate of device cost on a noisy link
        return min(chain1(f, k) for _ in range(reps))

    noop = jax.jit(lambda x: x + 1)
    noop(jnp.zeros((8,), jnp.int32))

    def floor():
        return chain(lambda: noop(jnp.zeros((8,), jnp.int32)))

    rtt = floor()
    print(f"noop chain floor: {rtt:.2f} ms/launch", flush=True)
    if rtt > 8.0:
        print("WARNING: link congested (floor > 8 ms/launch) — numbers "
              "below are unreliable; re-run when the tunnel recovers",
              flush=True)

    iso = float(cfg.iso)
    rec_fn = jax.jit(lambda v, i, n, ni, b: m._extract_records(
        v, i, n, iso=iso, n_iter=ni, batch=b), static_argnums=(3, 4))

    # extract_records at production and wider batches (same slot total)
    slots = ni_p * batch_p
    for b in (batch_p, batch_p * 2, batch_p * 4, slots):
        if slots % b:
            continue
        ni = slots // b
        if ids.shape[0] % b:
            continue
        rec_fn(vol, ids, ncd, ni, b)  # compile
        ms = chain(lambda ni=ni, b=b: rec_fn(vol, ids, ncd, ni, b))
        print(f"_extract_records batch={b} n_iter={ni}: "
              f"{ms - rtt:.2f} ms", flush=True)

    rec, tq = rec_fn(vol, ids, ncd, ni_p, batch_p)
    rec = jax.block_until_ready(rec)

    cnt = chain(lambda: m._count_cross(rec))
    print(f"_count_cross: {cnt - rtt:.2f} ms", flush=True)
    cpt = chain(lambda: m._compact_tq(rec, tq, nvcap))
    print(f"_compact_tq (scatter {tq.size} rows->src): "
          f"{cpt - rtt:.2f} ms", flush=True)

    # raw gather calibration from the padded flat volume
    rtt = floor()
    print(f"(floor re-check: {rtt:.2f} ms/launch)", flush=True)
    R = vol.shape[0]
    vflat = jnp.pad(vol, ((0, 1),) * 3, mode="edge").reshape(-1)
    vflat = jax.block_until_ready(vflat)
    take = jax.jit(jnp.take)
    for n in (1 << 17, 1 << 20, 1 << 23):
        idx = jnp.asarray(
            np.random.RandomState(1).randint(0, vflat.size, n, np.int32))
        idx = jax.block_until_ready(idx)
        take(vflat, idx)
        ms = chain(lambda idx=idx: take(vflat, idx)) - rtt
        print(f"take {n} scalar rows: {ms:.2f} ms = "
              f"{ms * 1e6 / n:.1f} ns/row", flush=True)

    # the full one-dispatch stages for reference
    fm = lambda: m._records_masked_split(  # noqa: E731
        vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p)
    fc = lambda: m._records_compact_split(  # noqa: E731
        vol, ids, ncd, iso=iso, n_iter=ni_p, batch=batch_p, nvcap=nvcap)
    fm()
    fc()
    rtt = floor()
    print(f"(floor re-check: {rtt:.2f} ms/launch)", flush=True)
    print(f"_records_masked_split:  {chain(fm) - rtt:.2f} ms", flush=True)
    print(f"_records_compact_split: {chain(fc) - rtt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
