"""Image -> mesh reconstruction pipeline (re-imagining test/create_sdf.py and
demo/demo.py).

One call runs: encode image -> dense or sparse SDF volume (infer/dense.py,
infer/sparse.py) -> on-device marching tetrahedra (ops/marching.py) ->
optional small-part cleaning -> OBJ. The reference's output tree is kept:
LOG_DIR/test_objs/[camest_]{res+1}_{iso}/{cat_id}/{cat_id}_{obj}_{view}.obj
(test/create_sdf.py:88-95, 305-314). Mesh extraction runs on device; OBJ
writing is async on a host thread pool like the reference's
ThreadPoolExecutor(4) (:238, 286-289).
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import numpy as np

from disn_tpu.config import Config
from disn_tpu.core import codecs
from disn_tpu.infer import dense as dense_mod
from disn_tpu.infer import sparse as sparse_mod
from disn_tpu.ops import marching
from disn_tpu.postprocessing import clean_small_parts

Params = dict[str, Any]


def predict_volume(params: Params, img: np.ndarray, trans_mat: np.ndarray,
                   sdf_params: np.ndarray, cfg: Config, sparse: bool = True,
                   block: int = 65536, mesh: Any = None) -> np.ndarray:
    if img.ndim == 3:
        img = img[None]
    if cfg.variant.value == "threedcnn":
        # volume decoder: one forward emits the fixed 65^3 grid directly
        # (models/sdfnet.py get_sdf_3dcnn path; create_sdf.py SPLIT_SIZE=1)
        import jax
        import jax.numpy as jnp
        from disn_tpu.models import disn as disn_mod

        @jax.jit
        def fwd(params, img):
            eps = disn_mod.apply(params, {"img": img,
                                          "sample_pc": jnp.zeros((1, 1, 3)),
                                          "trans_mat": jnp.zeros((1, 4, 3))},
                                 cfg)
            return dense_mod.scale_pred(eps["pred_sdf"], cfg)

        vals = np.asarray(fwd(params, jnp.asarray(img)))[0]
        r = round(len(vals) ** (1 / 3))
        return vals.reshape(r, r, r)
    # regress heads route through the SOUND Lipschitz band cull; binary
    # heads only through the heuristic sign-change-dilation cull when the
    # user opts in (cfg.binary_sparse) — the default keeps binary exact
    if sparse and cfg.sdf_res % cfg.sparse_stride == 0 \
            and (not cfg.binary or cfg.binary_sparse):
        # dynamic two-phase: with the fused kernel the fine pass is cheap
        # enough that sizing it from the synced count beats the full-cap
        # single jit even over the tunnel (167 vs 209 ms at 257^3 on the
        # analytic-octahedron workload)
        return sparse_mod.sparse_dense_sdf(
            params, img, trans_mat, sdf_params, cfg, block=block,
            stride=cfg.sparse_stride, band_factor=cfg.band_factor,
            cell_cap_frac=cfg.cell_cap_frac, device_out=True, dynamic=True)
    return dense_mod.dense_sdf(params, img, trans_mat, sdf_params, cfg,
                               block=block, mesh=mesh, device_out=True)


def volume_to_mesh(vol: np.ndarray, sdf_params: np.ndarray, iso: float = 0.0,
                   clean: bool = False, max_tris: int | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    # device-chained path: MC + weld on device, fetch only sliced buffers.
    # Oversized caps cost real scatter/weld time (buffers scale with the
    # cap), so start from the O(R^2) surface heuristic and retry at the
    # configured ceiling only when a high-genus shape overflows it.
    try:
        verts, faces = marching.extract_mesh_device(vol, sdf_params, iso=iso)
    except ValueError:
        verts, faces = marching.extract_mesh_device(vol, sdf_params, iso=iso,
                                                    max_tris=max_tris)
    if clean and len(faces):
        verts, faces = clean_small_parts(verts, faces)
    return verts, faces


# per-config bucket predictions (n_blocks, n_iter, nv, low_streak, nvc)
# for the speculative dispatch; nvc = (n_iter, batch, (nv_0..nv_C-1)) per-
# chunk crossing counts at the marching._chunk_bounds slot ranges (None
# until a covering image seeds them — they size the CHUNKED record stage's
# tqc buckets). Predictions RATCHET UP immediately (an under-prediction
# costs a full stage re-run + an extra round trip) and decay back down
# only after _SHRINK_STREAK consecutive smaller images (over-prediction
# costs only padded kernel slots / dead fetch bytes, ~12.5% per
# quarter-pow2 bucket step) — so a farm alternating between object sizes
# doesn't thrash between re-runs.
_SPEC_CACHE: dict = {}
_SHRINK_STREAK = 12
# config keys whose sparse-words guard tripped (boundary-touching actives /
# band violations): those workloads take the dense-volume flow directly
# instead of paying a guard trip + dense re-run every image
_SWORDS_SKIP: set = set()


def _merge_nvc(nvc_p, nvc):
    """Elementwise-ratcheted per-chunk nv prediction; boundaries (n_iter,
    batch, chunk bounds) must match or the stored counts are meaningless
    (the bounds can change under the _CHUNK_DESC knob)."""
    if nvc_p is None or nvc is None or nvc_p[:3] != nvc[:3]:
        return nvc
    return (*nvc[:3], tuple(max(a, b) for a, b in zip(nvc_p[3], nvc[3])))


def _update_pred(key, nb: int, ni: int, nv: int | None, nvc=None) -> None:
    """Fold this image's exact-needed buckets into the config's prediction
    with upward ratchet + streak-gated decay."""
    prev = _SPEC_CACHE.get(key)
    if prev is None:
        _SPEC_CACHE[key] = (nb, ni, nv, 0, nvc)
        return
    nb_p, ni_p, nv_p, streak, nvc_p = prev
    nb_n, ni_n = max(nb, nb_p), max(ni, ni_p)
    nv_n = nv if (nv_p is None or nv is None) else max(nv, nv_p)
    nvc_n = _merge_nvc(nvc_p, nvc)
    if (nb_n, ni_n, nv_n, nvc_n) != (nb, ni, nv, nvc):
        if streak + 1 >= _SHRINK_STREAK:
            _SPEC_CACHE[key] = (nb, ni, nv, 0, nvc)
            return
        _SPEC_CACHE[key] = (nb_n, ni_n, nv_n, streak + 1, nvc_n)
        return
    _SPEC_CACHE[key] = (nb, ni, nv, 0, nvc)


_NVCAP_MARGIN = 1.25  # headroom multiplier on the per-chunk tqc caps
_NVCAP_BUCKET = None  # None -> marching._qbucket (module knob for A/B)


def _nvcap_of(nvk: int) -> int:
    """Per-chunk tqc fetch cap from the predicted chunk crossing count:
    bucketed so cap drift between similar images reuses jit variants, with
    margin so small image-to-image nv growth doesn't force the exact
    re-run path (a cap miss costs ~40 ms)."""
    from disn_tpu.ops import marching as marching_mod
    bucket = _NVCAP_BUCKET or marching_mod._qbucket
    return bucket(max(4, int(nvk * _NVCAP_MARGIN)))


def _fused_bcap(n_blocks: int, sizes: dict) -> int:
    """Candidate-block cap for the extraction scan: active cells (<= the
    fine-pass bucket) + a ghost margin; derived from n_blocks so a
    predicted n_blocks implies its (consistent) bcap. The margin only
    covers boundary-ghost blocks (O(c^(2/3)) of c) — overflow flips gov
    and the caller falls back, so a tight margin is safe."""
    n_kcells = n_blocks * sizes["cells_per_block"]
    return -(-(n_kcells + max(1024, n_kcells // 16)) // 256) * 256


def _exact_blocks(c: int, sizes: dict) -> int:
    return min(sizes["max_blocks"], max(1, -(-c // sizes["cells_per_block"])))


def _needed_blocks(c: int, sizes: dict) -> int:
    # eighth-pow2 bucket (<=8 jit variants per octave; was quarter, and a
    # plain pow2 bucket padded the 257^3 fine pass 16384 vs 11712 active
    # cells — 40% wasted MXU work in the dominant kernel; the quarter step
    # still wasted 2560 cells ~ 2.5 ms at the production 17.9k count)
    from disn_tpu.ops import marching as marching_mod
    return min(sizes["max_blocks"], marching_mod._ebucket(_exact_blocks(c, sizes)))


def _run_pbm(ctx: dict, n_blocks: int):
    """Dispatch phase_b+scan at a block bucket. First return is the dense
    volume (classic flow) or the sparse words tuple (ctx['swords'], see
    sparse._phase_b_mesh_sparse_jit); the rest is identical."""
    cfg = ctx["cfg"]
    jit_fn = (sparse_mod._phase_b_mesh_sparse_jit if ctx["swords"]
              else sparse_mod._phase_b_mesh_jit)
    pbm = jit_fn(
        cfg, cfg.sparse_stride, ctx["block"], cfg.cell_cap_frac,
        cfg.band_factor, n_blocks, float(ctx["iso"]),
        _fused_bcap(n_blocks, ctx["sizes"]))
    embedding, endpoints, vol_c, cell_ids, count, esc_a = ctx["pa"]
    return pbm(ctx["params"], embedding, endpoints, vol_c, cell_ids, count,
               ctx["trans_d"], ctx["sdf_d"])


_PUT_CACHE: dict = {}


def _put_small(arr) -> "jnp.ndarray":
    """Device-put a SMALL host constant with value caching (bounded; the
    whole cache is a few KB of device memory). Only for read-only jit
    inputs — never donated buffers."""
    import jax.numpy as jnp

    a = np.asarray(arr)
    key = (a.shape, a.dtype.str, a.tobytes())
    buf = _PUT_CACHE.get(key)
    if buf is None:
        if len(_PUT_CACHE) >= 16:
            _PUT_CACHE.clear()
        buf = jnp.asarray(a)
        _PUT_CACHE[key] = buf
    return buf


class _NoOptFuture:
    """Stand-in for the speculative-assembly future when optimistic
    assembly is disabled: collect's self-check sees None and takes the
    exact synchronous join, identical to a speculation that bailed."""

    @staticmethod
    def result():
        return None


def _fused_dispatch(params: Params, img: np.ndarray, trans_mat: np.ndarray,
                    sdf_params: np.ndarray, cfg: Config, iso: float,
                    block: int = 32768, optimistic: bool = True) -> dict:
    """Stage 1 of the production fast path: dispatch phase-a and — when a
    bucket prediction exists (_SPEC_CACHE) — phase-b+scan and the record
    pass back-to-back, starting the record fetch streams. NO host sync
    happens here, so the eval farm can dispatch image k+1's whole device
    chain while image k's scalars are still crossing the tunnel.

    SPECULATIVE DISPATCH (round 3): the phase-b block bucket and record
    bucket are data-dependent, but OVER-prediction is always sound (padded
    slots mask out against device-resident counts), so the chain needs no
    intervening sync; all five scalars and the record buffers then ride
    ONE round trip in _fused_collect (~25 ms/sync on the axon link —
    round 2 paid three of them)."""
    import jax.numpy as jnp

    from disn_tpu.ops import marching as marching_mod

    from disn_tpu.infer import dense as dense_mod
    from disn_tpu.infer import fused as fused_mod

    stride = cfg.sparse_stride
    sizes, _, _ = sparse_mod._sparse_parts(
        cfg, stride, block, cfg.cell_cap_frac, cfg.band_factor)
    pa = sparse_mod._phase_a_jit(cfg, stride, block,
                                 cfg.cell_cap_frac, cfg.band_factor)
    key = (cfg, float(iso), block)
    swords = (bool(cfg.sparse_words) and key not in _SWORDS_SKIP
              and fused_mod.kernel_enabled(
                  cfg, dense_mod.normalize_fold(None, cfg), stride,
                  cfg.grid_resolution))
    # upload the small per-image constants ONCE: _run_pbm and any re-run
    # reuse the device buffers (each host->device put costs ~0.5 ms of
    # single-core dispatch work, ~3 ms/image at round-3 latencies).
    # Value-cached across images: a bench reuses one camera and a farm
    # reuses each object's sdf box across its 24 views — the round-5
    # dispatch profile read ~0.8 ms per put on this host
    trans_d = _put_small(trans_mat)
    sdf_d = _put_small(sdf_params)
    pa_out = pa(params, jnp.asarray(img), trans_d, sdf_d)
    ctx = dict(params=params, trans_mat=trans_mat, sdf_params=sdf_params,
               trans_d=trans_d, sdf_d=sdf_d, swords=swords,
               cfg=cfg, iso=iso, block=block, sizes=sizes, pa=pa_out,
               key=key, batch=4096, pred=None)
    # finer record buckets (batch 4096): ~10% fewer slot-dense bytes over
    # the tunnel at production counts
    pred = _SPEC_CACHE.get(ctx["key"])
    if pred is not None:
        nb_p, ni_p, nv_p, _, nvc_p = pred
        vol, esc_b, ids, ncd, gov_d, blk_d = _run_pbm(ctx, nb_p)
        ni_p, batch_p = marching_mod.records_n_iter(
            int(ids.shape[0]), ni_p * ctx["batch"], ctx["batch"])
        # NOTE: these fetch futures cannot be cancelled mid-transfer; on a
        # misprediction or fallback the abandoned bytes still cross the
        # tunnel and contend with the corrective work — an accepted cost
        # of the rare path (a hit saves ~25 ms every image; a miss pays
        # ~1 MB of dead transfer once per workload density transition)
        # ALL validation scalars (phase-a count + escapes, scan count,
        # group overflow, vertex count) ride the record fetch streams as a
        # tiny flags vector — the hit path then never issues a bare
        # jax.device_get, whose ~25-40 ms round trip was the collect
        # step's critical path
        _, _, _, _, count, esc_a = ctx["pa"]
        scalars = (count, esc_a, esc_b, ncd, gov_d)
        if (nv_p is not None and cfg.compact_tq and nvc_p is not None
                and optimistic and nvc_p[:3] == (
                    ni_p, batch_p,
                    tuple(marching_mod._chunk_bounds(ni_p)))):
            # CHUNKED COMPACT only for latency callers (optimistic=True,
            # i.e. single-image): its extra per-image host CPU (5 more jit
            # dispatches + 7 more fetch submissions + chunk joins, ~+16 ms
            # on the 1-core farm host) blows the farm's thin CPU budget —
            # farm A/B measured masked 68.6 vs cchunk 122 ms/img while
            # single-image measured cchunk ~114 vs ~125 ms bench
            # (probe_farm_breakdown / probe_e2e_breakdown, round 4b). The
            # farm (optimistic=False) is device-bound and byte-insensitive,
            # so it takes the CPU-cheapest masked stream below.
            # per-chunk vertex counts predicted too: CHUNKED compact record
            # stage — each slot-range chunk is its own jit emitting
            # (rec_k, crossing-only tqc_k), so the earliest chunks' fetch
            # bytes cross the tunnel while the later chunks still compute
            # (the unchunked stage made every byte wait for the last slot;
            # chunk k's per-chunk nv rides the flags vector, which the
            # last tiny jit emits from the chunk scalars)
            if ctx["swords"]:
                words = vol
                chunk_fn = marching_mod._records_chunk_compact_sparse
            else:
                words = marching_mod._dense_words_jit(vol, iso=float(iso))
                chunk_fn = marching_mod._records_chunk_compact
            bounds = marching_mod._chunk_bounds(ni_p)
            nvcaps = tuple(_nvcap_of(nvk) for nvk in nvc_p[3])
            parts = [blk_d]
            nv_ds = []
            for k, (s, sz) in enumerate(bounds):
                rec_k, tqc_k, nv_k = chunk_fn(
                    words, ids, ncd, R=cfg.grid_resolution,
                    start=s * batch_p, size=sz * batch_p, nvcap=nvcaps[k])
                parts += [rec_k, tqc_k]
                nv_ds.append(nv_k)
            flags_d = marching_mod._flags_stack([*scalars, *nv_ds])
            # flags submitted FIRST: a fetch only proceeds once its buffer
            # is computed, so submission order is free — but if the pool
            # ever saturates, flags (the collect step's critical wait)
            # must not be the one queuing behind a full worker set
            subs = marching_mod.records_submit([flags_d, *parts])
            C = len(bounds)
            # futs layout [blk, rec_0.., tqc_0.., flags]
            futs = ([subs[1]] + [subs[2 + 2 * k] for k in range(C)]
                    + [subs[3 + 2 * k] for k in range(C)] + [subs[0]])
            ctx.update(mode="cchunk", nvcap=nvcaps,
                       cslots=[sz * batch_p for _, sz in bounds])
        else:
            if ctx["swords"]:
                rec_d, tq0, tq1, tq2, flags_d = \
                    marching_mod._records_masked_split_sparse(
                        vol, ids, ncd, R=cfg.grid_resolution, n_iter=ni_p,
                        batch=batch_p, scalars=scalars)
            else:
                rec_d, tq0, tq1, tq2, flags_d = \
                    marching_mod._records_masked_split(
                        vol, ids, ncd, iso=float(iso), n_iter=ni_p,
                        batch=batch_p, scalars=scalars)
            futs = marching_mod.records_submit(
                (tq0, tq1, tq2, blk_d, rec_d, flags_d))
            ctx.update(mode="masked", nvcap=None, cslots=None)
        # optimistic assembly: builds the mesh on a background thread as
        # soon as the fetches land — concurrently with the validation
        # scalars' round trip in _fused_collect, which then only accepts
        # (common) or discards (rare fallback) the result. Single-image
        # callers default ON even on a 1-core host: the main thread
        # blocks idle on the flags future (GIL released), so the worker
        # overlaps for free (round-4 TPU A/B: compact+opt 131-133 ms vs
        # compact no-opt ~166 bench). The FARM passes optimistic=False —
        # there the main thread is busy dispatching the next image and
        # the worker steals its core (farm 129 -> 249 ms/img regression)
        if optimistic:
            opt = marching_mod.records_assemble_speculative(
                futs, sdf_params, cfg.grid_resolution, ctx["mode"],
                ctx["nvcap"], chunk_slots=ctx["cslots"])
        else:
            import threading
            opt = (_NoOptFuture(), threading.Event())
        ctx.update(pred=(nb_p, ni_p, batch_p),
                   pbm=(vol, esc_b, ids, ncd, gov_d), blk=blk_d,
                   futs=futs, opt=opt)
    return ctx


def _fused_collect(ctx: dict, defer: bool = False
                   ) -> tuple[np.ndarray, np.ndarray] | None:
    """Stage 2: ONE combined scalar sync + validation. A mispredicted-under
    bucket re-runs only the affected stage at the exact bucket. Returns
    (verts, faces), a zero-argument assembly closure (defer=True), or None
    when a fallback condition fires (cap overflow / kernel escape
    overflow) — the caller then runs the exact unfused path."""
    import jax

    from disn_tpu.ops import marching as marching_mod

    sizes = ctx["sizes"]
    cfg = ctx["cfg"]
    iso = ctx["iso"]
    sdf_params = ctx["sdf_params"]
    batch = ctx["batch"]
    key = ctx["key"]
    R = cfg.grid_resolution
    _, _, _, _, count, esc_a = ctx["pa"]
    if ctx["pred"] is not None:
        nb_p, ni_p, batch_p = ctx["pred"]
        vol, esc_b, ids, ncd, gov_d = ctx["pbm"]
        futs = ctx["futs"]
        nvcap = ctx["nvcap"]
        opt_fut, opt_cancel = ctx["opt"]
        mode = ctx["mode"]
        # the validation scalars arrive ON the record fetch streams (a
        # tiny extra buffer) — no bare device_get round trip on the hit
        # path. Layout: masked [*scalars, nv, nv_0..C-1] on futs[5];
        # cchunk [*scalars, nv_0..C-1] on futs[-1] (nv = sum of chunks)
        flags = [int(x) for x in
                 (futs[-1] if mode == "cchunk" else futs[5]).result()]
        if mode == "cchunk":
            c, ea, eb, nc, gov = flags[:5]
            nvks = flags[5:]
            nv = sum(nvks)
        else:
            c, ea, eb, nc, gov, nv = flags[:6]
            nvks = flags[6:]
        if c > sizes["cell_cap"] or ea > 0:
            opt_cancel.set()
            return None
        covered = ni_p * batch_p >= nc
        # nv (and the per-chunk counts) are trustworthy only when the
        # record slots covered nc (else the compaction ran over a
        # truncated slot set and undercounts)
        _update_pred(key, _needed_blocks(c, sizes),
                     marching_mod.records_n_iter(
                         int(ids.shape[0]), nc, batch)[0],
                     nv if covered else None,
                     (ni_p, batch_p,
                      tuple(marching_mod._chunk_bounds(ni_p)), tuple(nvks))
                     if covered and nvks else None)
        if nb_p >= _exact_blocks(c, sizes):
            # prediction covered the work: the speculative results are the
            # exact results (padded slots were masked in-kernel)
            if eb > 0:
                opt_cancel.set()
                return None
            if gov <= 0:
                caps_ok = (nvcap is None
                           or (all(a <= b for a, b in zip(nvks, nvcap))
                               if mode == "cchunk" else nv <= nvcap))
                if covered and caps_ok:
                    def fin(nc=nc, nv=nv, mode=mode):
                        # the optimistic assembly has been running since
                        # the fetches landed (concurrent with the scalar
                        # sync above); its self-derived counts must agree
                        # with the device's
                        res = opt_fut.result()
                        if res is not None:
                            verts, faces, n_o, nv_o = res
                            if n_o == nc and nv_o == nv:
                                return verts, faces
                        # self-check bailed or disagreed (shouldn't happen
                        # when covered): exact synchronous join
                        if mode == "cchunk":
                            return marching_mod.records_finish_cchunk(
                                futs, sdf_params, nc, nv, R)()
                        if mode == "compact":
                            return marching_mod.records_finish_compact(
                                futs, sdf_params, nc, nv, R)()
                        return marching_mod.records_finish_masked(
                            futs, sdf_params, nc, R)()
                    if defer:
                        # the farm joins the in-flight fetches on a writer
                        # thread: the main thread moves on to the next
                        # image while these records land
                        return fin
                    return fin()
                # record bucket (or compact-tq vertex bucket) under-
                # predicted: re-run ONLY the record pass at the exact
                # bucket (ids/vol|words/blk still on device)
                opt_cancel.set()
                if ctx["swords"]:
                    fetch = marching_mod.extract_mesh_records_deferred_sparse(
                        vol, R, sdf_params, ids, nc, ctx["blk"], iso=iso,
                        join=not defer)
                else:
                    fetch = marching_mod.extract_mesh_records_deferred(
                        vol, sdf_params, ids, nc, iso=iso, join=not defer,
                        blk=ctx["blk"])
                return fetch if defer else fetch()
            # gov > 0 with a consistent bcap: genuine group overflow ->
            # full-volume rescan fallback below
            opt_cancel.set()
        else:
            opt_cancel.set()
            # under-predicted block bucket: phase-b covered only part of
            # the active set — re-run it at the exact bucket
            vol, esc_b, ids, ncd, gov_d, blk_d = _run_pbm(
                ctx, _needed_blocks(c, sizes))
            eb, nc, gov = (int(x) for x in jax.device_get(
                (esc_b, ncd, gov_d)))
            # re-seed the record bucket from the CORRECTED scan: the
            # partial scan's nc under-counts and would mispredict the
            # next image's record pass too (round-3 review)
            _update_pred(key, _needed_blocks(c, sizes),
                         marching_mod.records_n_iter(
                             int(ids.shape[0]), nc, batch)[0], None)
            if eb > 0:
                return None
            if gov <= 0:
                if ctx["swords"]:
                    fetch = marching_mod.extract_mesh_records_deferred_sparse(
                        vol, R, sdf_params, ids, nc, blk_d, iso=iso,
                        join=not defer)
                else:
                    fetch = marching_mod.extract_mesh_records_deferred(
                        vol, sdf_params, ids, nc, iso=iso, join=not defer,
                        blk=blk_d)
                return fetch if defer else fetch()
    else:
        # no prediction yet: sequential two-sync flow, seeding the cache
        c, ea = (int(x) for x in jax.device_get((count, esc_a)))
        if c > sizes["cell_cap"] or ea > 0:
            return None
        nb = _needed_blocks(c, sizes)
        vol, esc_b, ids, ncd, gov_d, blk_d = _run_pbm(ctx, nb)
        eb, nc, gov = (int(x) for x in jax.device_get((esc_b, ncd, gov_d)))
        _update_pred(key, nb, marching_mod.records_n_iter(
            int(ids.shape[0]), nc, batch)[0], None)
        if eb > 0:
            return None
        if gov <= 0:
            if ctx["swords"]:
                fetch = marching_mod.extract_mesh_records_deferred_sparse(
                    vol, R, sdf_params, ids, nc, blk_d, iso=iso,
                    join=not defer)
            else:
                fetch = marching_mod.extract_mesh_records_deferred(
                    vol, sdf_params, ids, nc, iso=iso, join=not defer,
                    blk=blk_d)
            return fetch if defer else fetch()
    if ctx["swords"]:
        # the sparse-words flow carries no dense volume to rescan: gov > 0
        # (boundary-touching actives / band violation / group overflow)
        # re-runs THIS image through the dense-volume flow from the same
        # phase-a outputs, and pins the config key to the dense flow — a
        # workload that trips the guard once (e.g. surfaces cut by the
        # volume boundary) would otherwise pay a doubled phase_b every
        # image. Protocol data (ShapeNet-normalized, inside the box)
        # never trips it.
        _SWORDS_SKIP.add(key)
        ctx["swords"] = False
        ctx["pred"] = None
        return _fused_collect(ctx, defer=defer)
    # high-genus group-cap overflow: rescan the (already computed) volume
    # at the configured ceiling
    mt = cfg.max_triangles
    mesh_ = marching_mod.extract_mesh_owned(
        vol, sdf_params, iso=iso,
        gcap=None if mt is None else max(512, mt // 12), packed=True)
    return (lambda: mesh_) if defer else mesh_


def _sparse_fused_mesh(params: Params, img: np.ndarray,
                       trans_mat: np.ndarray, sdf_params: np.ndarray,
                       cfg: Config, iso: float, block: int = 32768,
                       defer: bool = False
                       ) -> tuple[np.ndarray, np.ndarray] | None:
    """Production fast path: sparse two-phase inference with the mesh
    extractor's active-cell scan fused into phase_b (one jit) and
    speculative bucket dispatch — see _fused_dispatch/_fused_collect
    (split so the eval farm can software-pipeline consecutive images)."""
    if img.ndim == 3:
        img = img[None]
    return _fused_collect(
        _fused_dispatch(params, img, trans_mat, sdf_params, cfg, iso,
                        block=block), defer=defer)


def warm_fused(params: Params, img: np.ndarray, trans_mat: np.ndarray,
               sdf_params: np.ndarray, cfg: Config, iso: float | None = None,
               block: int = 32768) -> tuple[np.ndarray, np.ndarray] | None:
    """Compile-warm EVERY jit the speculative fast path can hit on this
    workload, so a fresh-process benchmark measures the pipeline rather
    than compiles (the round-4 driver bench read 125 ms where hand-warmed
    runs read 114 — chunk-jit compiles poisoned its timed median).

    Three passes walk the prediction ladder (seed -> masked stream ->
    chunked-compact stream: each mode's jits compile on its first hit);
    a fourth dispatch then compiles the chunk jits at the tqc bucket ONE
    STEP either side of the predicted one, plus the matching flags-stack
    lengths, so bucket drift between warm-up and the timed reps cannot
    trigger an in-rep compile. Returns the last mesh (None when the fused
    path is ineligible and callers should warm their fallback instead)."""
    from disn_tpu.ops import marching as m

    iso = cfg.iso if iso is None else iso
    if img.ndim == 3:
        img = img[None]
    out = None
    for _ in range(3):
        out = _sparse_fused_mesh(params, img, trans_mat, sdf_params, cfg,
                                 iso, block=block)
        if out is None:
            return None
    pred = _SPEC_CACHE.get((cfg, float(iso), block))
    if pred is None or pred[4] is None or not cfg.compact_tq:
        return out
    ctx = _fused_dispatch(params, img, trans_mat, sdf_params, cfg, iso,
                          block=block)
    res = _fused_collect(ctx)
    if ctx.get("pred") is None or ctx.get("mode") != "cchunk":
        return res if res is not None else out
    _, ni_p, batch_p = ctx["pred"]
    vol = ctx["pbm"][0]
    ids, ncd = ctx["pbm"][2], ctx["pbm"][3]
    if ctx["swords"]:
        words = vol
        chunk_fn = m._records_chunk_compact_sparse
    else:
        words = m._dense_words_jit(vol, iso=float(iso))
        chunk_fn = m._records_chunk_compact
    bounds = m._chunk_bounds(ni_p)
    bucket = _NVCAP_BUCKET or m._qbucket
    for k, (s, sz) in enumerate(bounds):
        cap = ctx["nvcap"][k]
        for cap_n in (bucket(max(4, cap - 1)), bucket(cap + 1)):
            if cap_n != cap:
                chunk_fn(
                    words, ids, ncd, R=cfg.grid_resolution,
                    start=s * batch_p, size=sz * batch_p, nvcap=cap_n)
    # the flags vector is one tiny jit per length; its length is fixed at
    # 5 scalars + len(bounds) chunk counts, already compiled by the pass
    # above — nothing else on the hit path is shape-dependent
    return res if res is not None else out


def image_to_mesh(params: Params, img: np.ndarray, trans_mat: np.ndarray,
                  cfg: Config, sdf_params: np.ndarray | None = None,
                  iso: float | None = None, sparse: bool = True,
                  clean: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Single image ([H,W,3|4]: float in [0,1], or uint8 — normalized
    on-device, 4x fewer upload bytes) -> (vertices, faces).

    sdf_params defaults to the demo's unit box [-1,1]^3 (demo/demo.py:278)."""
    if sdf_params is None:
        sdf_params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    iso = cfg.iso if iso is None else iso
    if img.ndim == 3:
        img = img[None]
    if (sparse and cfg.variant.value != "threedcnn"
            and cfg.sdf_res % cfg.sparse_stride == 0
            and (not cfg.binary or cfg.binary_sparse)):
        out = _sparse_fused_mesh(params, img, trans_mat, sdf_params, cfg,
                                 iso)
        if out is not None:
            verts, faces = out
            if clean and len(faces):
                verts, faces = clean_small_parts(verts, faces)
            return verts, faces
    vol = predict_volume(params, img, trans_mat, sdf_params, cfg,
                         sparse=sparse)
    return volume_to_mesh(vol, sdf_params, iso=iso, clean=clean,
                          max_tris=cfg.max_triangles)


_SHARDED_FNS: dict = {}


def image_to_mesh_sharded(params: Params, img: np.ndarray,
                          trans_mat: np.ndarray, cfg: Config, mesh,
                          sdf_params: np.ndarray | None = None,
                          iso: float | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-chip single-image image->mesh (SURVEY §2.9 P3/P4 end to end):
    points-striped sparse inference (each device runs the fused Pallas
    kernel over its stripe of the active-cell list) and a points-striped
    record pass; welded host assembly is unchanged. Falls back to the
    sharded dense path on cull overflow / kernel escapes, and to the
    owned extractor on group overflow — results always exact.

    The farm parallelizes per-image, so this path matters when SINGLE-image
    latency must scale past one chip (round-2 verdict missing #3)."""
    import jax
    import jax.numpy as jnp

    from disn_tpu.ops import marching as marching_mod
    from disn_tpu.parallel.mesh import POINT_AXIS

    if sdf_params is None:
        sdf_params = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    iso = cfg.iso if iso is None else iso
    if img.ndim == 3:
        img = img[None]
    key = ("sparse", mesh, cfg)
    if key not in _SHARDED_FNS:
        _SHARDED_FNS[key] = sparse_mod.make_sharded_sparse_fn(
            cfg, mesh, stride=cfg.sparse_stride,
            cell_cap_frac=cfg.cell_cap_frac, band_factor=cfg.band_factor)
    sfn, cap = _SHARDED_FNS[key]
    vol, count_d, esc_d = sfn(params, jnp.asarray(img),
                              jnp.asarray(trans_mat),
                              jnp.asarray(sdf_params))
    c, esc = (int(x) for x in jax.device_get((count_d, esc_d)))
    if c > cap or esc > 0:
        vol = dense_mod.dense_sdf(params, img, trans_mat, sdf_params,
                                  cfg, mesh=mesh, device_out=True)
        vol = jnp.asarray(vol, jnp.float32)
    R = cfg.grid_resolution
    ids, ncd, gov_d = marching_mod._active_cells_ext(
        jnp.asarray(vol, jnp.float32), float(iso),
        marching_mod._norm_gcap(R, None))
    nc, gov = (int(x) for x in jax.device_get((ncd, gov_d)))
    if gov > 0:
        return marching_mod.extract_mesh_owned(
            vol, sdf_params, iso=iso,
            gcap=None if cfg.max_triangles is None
            else max(512, cfg.max_triangles // 12), packed=True)
    if nc == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    n_dev = mesh.shape[POINT_AXIS]
    ids_len = int(ids.shape[0])
    batch = marching_mod._fit_batch(ids_len, 8192)
    # the striped record pass needs n_iter divisible by n_dev AND within
    # the ids buffer (its per-device dynamic_slice must never clamp); tiny
    # grids that can't satisfy both just extract single-device
    if ids_len // batch < n_dev:
        return marching_mod.extract_mesh_records_deferred(
            vol, sdf_params, ids, nc, iso=iso)()
    per_dev = min(marching_mod._qbucket(max(1, -(-nc // (batch * n_dev)))),
                  ids_len // batch // n_dev)
    n_iter = n_dev * per_dev
    if n_iter * batch < nc:
        # flooring ids_len//batch to an n_dev multiple left some active
        # cells uncovered (dense field near the cap) — the striped pass
        # would silently drop them and the assembler would read past the
        # fetched buffers; extract single-device instead (round-3 review)
        return marching_mod.extract_mesh_records_deferred(
            vol, sdf_params, ids, nc, iso=iso)()
    rkey = ("records", mesh, R, float(iso), n_iter, batch)
    if rkey not in _SHARDED_FNS:
        _SHARDED_FNS[rkey] = marching_mod.make_sharded_records_fn(
            mesh, R, iso=float(iso), n_iter=n_iter, batch=batch)
    rfn, n_slots = _SHARDED_FNS[rkey]
    rec_d, tq_d = rfn(jnp.asarray(vol, jnp.float32), ids, ncd)
    ids_s = marching_mod._slice_rows(ids, n_slots)
    futs = marching_mod.records_start_fetch(rec_d, tq_d, ids_s)
    return marching_mod.records_finish(futs, sdf_params, nc, R)()


def reconstruct_multiview(params: Params, cfg: Config, paths, listinfo,
                          log_dir: str, logger: Any = None) -> list[str]:
    """--multi_view path: per object, fuse ALL views' features and write one
    mesh {cat}_{obj}_fused.obj (reference get_decoder flow,
    model_normalization.py:223-238)."""
    from disn_tpu.infer import multiview

    by_obj: dict[tuple[str, str], list[int]] = {}
    for cat_id, obj, view in listinfo:
        by_obj.setdefault((cat_id, obj), []).append(view)
    out_root = result_dir(log_dir, cfg) + "_mv"
    written = []
    for (cat_id, obj), views in sorted(by_obj.items()):
        imgs, mats = [], []
        for v in sorted(views):
            rec = codecs.read_view_h5(paths.img_path(cat_id, obj, v))
            imgs.append(rec.img_arr[:, :, :cfg.img_channels])  # u8:
            # normalized on-device (disn.encode), 4x fewer upload bytes
            mats.append(rec.trans_mat)
        sdf_params = codecs.read_sdf_params(paths.sdf_path(cat_id, obj))
        # two-level sparse cull first (~16x fewer fused decodes at 257^3);
        # exact dense streaming on cap overflow / non-stride grids
        vol = multiview.multiview_sdf_sparse(
            params, np.stack(imgs), np.stack(mats), sdf_params, cfg)
        if vol is None:
            vol = multiview.multiview_sdf(params, np.stack(imgs),
                                          np.stack(mats), sdf_params, cfg)
        verts, faces = volume_to_mesh(vol, sdf_params, iso=cfg.iso)
        out = os.path.join(out_root, cat_id, f"{cat_id}_{obj}_fused.obj")
        codecs.write_obj(out, verts, faces)
        written.append(out)
        if logger:
            logger.log(f"fused {len(views)} views: {cat_id}/{obj}")
    return written


def result_dir(log_dir: str, cfg: Config, cam_est: bool = False) -> str:
    tag = f"{cfg.grid_resolution}_{cfg.iso}"
    if cam_est:
        tag = "camest_" + tag
    return os.path.join(log_dir, "test_objs", tag)


def reconstruct_split(params: Params, cfg: Config, paths, listinfo,
                      log_dir: str, cam_est: bool = False,
                      sparse: bool = True, logger: Any = None,
                      writers: int = 4, prefetch: int = 4,
                      shard_index: int = 0, shard_count: int = 1,
                      depth: int = 2) -> list[str]:
    """create_sdf.py equivalent: reconstruct every (cat, obj, view) of a
    split into the reference's output tree. Returns written OBJ paths.

    Eval-farm pipelining (the reference runs 79 sequential sess.runs per
    image, single process): a reader thread prefetches h5 records ahead of
    the device, the main thread owns ALL device work (prediction,
    extraction, mesh transfer — strictly sequential, see the in-loop
    comment), a writer pool overlaps file writes, and the object list
    stripes over (shard_index, shard_count) so independent hosts/chips each
    own a disjoint slice (README.md:104-110's manual per-GPU scale-out,
    made a parameter)."""
    from queue import Empty, Queue
    from threading import Event, Thread

    my_list = [t for i, t in enumerate(listinfo)
               if i % shard_count == shard_index]
    out_root = result_dir(log_dir, cfg, cam_est)
    # writer threads only hide I/O waits; their Python-side work (buffer
    # copies) holds the GIL and starves the device-dispatch thread on small
    # hosts — measured 1154 ms/img with 4 writers vs 623 with 1 on the
    # single-core eval host. Clamp to the spare cores.
    writers = max(1, min(writers, (os.cpu_count() or 2) - 1))
    q: Queue = Queue(maxsize=max(1, prefetch))

    stop = Event()

    def reader():
        # per-object sdf_params cache: consecutive views share the object,
        # and reconstruction needs ONLY the [6] bbox params — the full
        # read_sdf_h5 gunzipped the sample arrays per view (~3.6 ms of the
        # 1-core CPU budget each; the farm is host-CPU-bound)
        sdf_key, sdf_params = None, None
        for cat_id, obj, view in my_list:
            if stop.is_set():
                break
            try:
                rec = codecs.read_view_h5(paths.img_path(cat_id, obj, view))
                if (cat_id, obj) != sdf_key:
                    sdf_params = codecs.read_sdf_params(
                        paths.sdf_path(cat_id, obj))
                    sdf_key = (cat_id, obj)
                q.put((cat_id, obj, view, rec, sdf_params))
            except Exception as e:  # surface to the consumer and STOP:
                # the main thread re-raises, so reading on would park this
                # thread forever on the bounded queue, pinning h5 buffers
                q.put(e)
                return
        q.put(None)

    t = Thread(target=reader, daemon=True)
    t.start()
    pool = ThreadPoolExecutor(writers)
    futures = []
    written = []

    def flush(pending):
        """Collect a previously-dispatched image: one scalar sync +
        validation (the NEXT image's device chain is already queued behind
        it, so the device never idles across the sync), then hand assembly
        + write to the pool."""
        ctx, rec, sdf_params, img, out, tag = pending
        assemble = _fused_collect(ctx, defer=True) if ctx else None
        if assemble is None:
            # fallback (ineligible config / cap overflow / escapes):
            # exact unfused path, serial — rare by design
            vol = predict_volume(params, img, rec.trans_mat,
                                 sdf_params, cfg, sparse=sparse)
            mesh_ = volume_to_mesh(vol, sdf_params, iso=cfg.iso,
                                   max_tris=cfg.max_triangles)
            assemble = lambda m=mesh_: m  # noqa: E731

        def write(assemble=assemble, out=out):
            verts, faces = assemble()
            codecs.write_obj(out, verts, faces)

        futures.append(pool.submit(write))
        # backpressure: each pending future pins ~2-3 MB of record
        # buffers; bound the backlog, don't grow it for the split
        while len(futures) > 4 * writers + 4:
            futures.pop(0).result()
        if logger:
            logger.log(f"reconstructed {tag}")

    # software pipeline, `depth` images deep: dispatch image k's device
    # chain (no sync — _fused_dispatch), then collect image k-depth. The
    # main thread still owns ALL device traffic (round-2 finding: device
    # work from worker threads contends on the tunnel); the pool only
    # joins already-in-flight fetches and runs native assembly + OBJ
    # writes. depth=2 (round 4): at depth 1 the device idled ~15-50
    # ms/image on the 1-core eval host — the writer pool's C work
    # (GIL-released but core-occupying) stretched the main thread's ~20 ms
    # dispatch segment past the 67 ms device window; a second queued image
    # gives the host a full extra window of slack (interleaved A/B: 86 ->
    # 74-78 ms/img; depth 3 measured no further gain). Each pending image
    # pins ~35 MB of device volume + ~0.5 MB of fetches.
    from collections import deque
    pendings: deque = deque()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            cat_id, obj, view, rec, sdf_params = item
            # u8 straight through: normalized on-device (disn.encode) —
            # 4x fewer tunnel bytes AND no 1-core host astype/divide
            img = rec.img_arr[:, :, :cfg.img_channels]
            # two-digit view id like the reference output tree
            # (test/create_sdf.py:311, view ids from the NN.h5 stems)
            out = os.path.join(out_root, cat_id,
                               f"{cat_id}_{obj}_{view:02d}.obj")
            written.append(out)
            ctx = None
            if (sparse and cfg.variant.value != "threedcnn"
                    and cfg.sdf_res % cfg.sparse_stride == 0
                    and (not cfg.binary or cfg.binary_sparse)
                    and img.ndim == 3):
                # optimistic=False: the farm's writer pool already owns
                # assembly (deferred fin), so speculative assembly here
                # only adds threads outside the pool's core clamp — on the
                # 1-core eval host it regressed the farm 129 -> 249 ms/img
                ctx = _fused_dispatch(params, img[None], rec.trans_mat,
                                      sdf_params, cfg, iso=cfg.iso,
                                      optimistic=False)
            pendings.append((ctx, rec, sdf_params, img, out,
                             f"{cat_id}/{obj}/{view}"))
            while len(pendings) > max(1, depth):
                flush(pendings.popleft())
        while pendings:
            flush(pendings.popleft())
        for f in futures:
            f.result()
    finally:
        stop.set()
        # unblock a reader parked on the full queue, then join it —
        # otherwise it pins h5 record buffers for the process lifetime
        while t.is_alive():
            try:
                q.get(timeout=0.1)
            except Empty:
                pass
        t.join()
        # wait: abandoning in-flight OBJ writes would leave truncated
        # files; the backpressure bound keeps the backlog small
        pool.shutdown(wait=True)
    return written
