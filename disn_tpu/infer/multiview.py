"""Multi-view fused reconstruction (reference --multi_view path:
placeholder_features + get_decoder, models/model_normalization.py:38-45,
84-90, 223-238).

Each of V views is encoded once; per query point, the global embedding and
the per-view local features (sampled through each view's own trans_mat) are
AVERAGED in feature space, then decoded by the same two MLP streams.

TPU-native structure (round 5): with tf1 sampling the per-view fold-137
identity applies per view — each view's five endpoint maps and the
1472->512 local matmul collapse into ONE [137,137,512] map (see
infer/dense.normalize_fold), and because feature averaging is linear the
fused per-point local contribution is simply the MEAN of the V folded-map
samples. Per point that is V x 4 aligned 512-wide gather rows + the pure
point MLP, instead of V x 20 taps + a per-point 1472->512 matmul — the
round-4 gather law made the unfolded form decode-bound (a 257^3 sparse
fine pass measured ~28.6 s; the folded two-phase form below is the fix).
Other variants / native sampling keep the general per-view path.

Volumes are returned as DEVICE arrays: the extraction chain
(pipeline.volume_to_mesh) consumes them in place, so the [R^3] f32 volume
(69 MB at 257^3, ~2 s over the tunnel) never crosses to the host.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from disn_tpu.config import Config
from disn_tpu.core import camera, grids
from disn_tpu.models import disn, sdfnet
from disn_tpu.ops import image as image_ops

Params = dict[str, Any]


def encode_views(params: Params, imgs: jnp.ndarray, cfg: Config):
    """imgs [V,H,W,C] -> (embeddings [V,G], endpoints dict of [V,h,w,c])."""
    return disn.encode(params, imgs, cfg)


def _use_fold(cfg: Config) -> bool:
    from disn_tpu.infer import dense as dense_mod
    return dense_mod.normalize_fold(None, cfg) == "137"


def _mv_prep(params: Params, imgs: jnp.ndarray, cfg: Config):
    """Encode V views once; build the per-point decode state.

    Folded (twostream + tf1): (fused_embedding, merged [V,137,137,512],
    g_contrib [1,512], None) — merged is each view's endpoint pyramid
    pre-multiplied by its slice of the local fold2 weight and resized-
    summed into the shared 137 space (infer/dense._prep fold='137', per
    view); g_contrib is the mean embedding's global-stream contribution
    (mean commutes with the matmul).
    General: (fused_embedding, None, None, endpoints [V,...])."""
    embeddings, endpoints = disn.encode(params, imgs, cfg)
    fused_embedding = jnp.mean(embeddings, axis=0, keepdims=True)
    if not _use_fold(cfg):
        return fused_embedding, None, None, endpoints
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    _, w_local = sdfnet.split_local_fold2(params["sdfprediction_imgfeat"])
    w_local = w_local.astype(cd)
    merged = None
    off = 0
    for n in disn.endpoint_names(cfg):
        c = endpoints[n].shape[-1]
        m = jnp.einsum("bhwc,cd->bhwd", endpoints[n].astype(cd),
                       w_local[off:off + c])
        off += c
        r = image_ops.resize_bilinear(m, cfg.img_h, cfg.img_w)
        merged = r if merged is None else merged + r       # [V,137,137,512]
    wg = params["sdfprediction"]["fold2"]["conv1"]["weights"]
    g_contrib = jax.lax.dot_general(
        fused_embedding.astype(cd), wg[512:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())))
    return fused_embedding, merged, g_contrib, None


def fused_point_features(endpoints: dict[str, jnp.ndarray],
                         pts: jnp.ndarray, trans_mats: jnp.ndarray,
                         cfg: Config) -> jnp.ndarray:
    """Per-point local features averaged over views (general path):
    [N, local_dim]. pts [N,3]; trans_mats [V,4,3]; endpoints carry a
    leading view axis."""
    names = disn.endpoint_names(cfg)

    def one_view(view_endpoints, trans_mat):
        px = camera.project_points(pts[None], trans_mat[None],
                                   img_w=cfg.img_w, img_h=cfg.img_h)
        sample = (image_ops.sample_native if cfg.sampling == "native"
                  else image_ops.resize_then_sample)
        return jnp.concatenate(
            [sample(view_endpoints[n], px, cfg.img_h, cfg.img_w)
             for n in names], axis=-1)[0]

    per_view_eps = {n: endpoints[n][:, None] for n in names}  # [V,1,h,w,c]
    feats = jax.vmap(one_view)(per_view_eps, trans_mats)      # [V,N,L]
    return jnp.mean(feats, axis=0)


def _mv_decode(params: Params, state, trans_mats: jnp.ndarray,
               pts: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Fused multiview decode of [N,3] world points -> [N] scaled SDF."""
    from disn_tpu.infer.dense import scale_pred
    fused_embedding, merged, g_contrib, endpoints = state
    if merged is not None:
        V = merged.shape[0]
        cd = merged.dtype
        px = camera.project_points(
            jnp.broadcast_to(pts[None], (V,) + pts.shape), trans_mats,
            img_w=cfg.img_w, img_h=cfg.img_h)                 # [V,P,2]
        taps = image_ops.resampler(merged, px)                # [V,P,512]
        local = jnp.mean(taps.astype(jnp.float32), axis=0,
                         keepdims=True).astype(cd)            # [1,P,512]
        pred = sdfnet.apply_two_stream_prefold(
            params["sdfprediction"], params["sdfprediction_imgfeat"],
            pts[None], g_contrib, local, cd)
    else:
        local = fused_point_features(endpoints, pts, trans_mats, cfg)
        pred = disn.decode_from_features(
            params, pts[None], fused_embedding, local[None], cfg)
    if cfg.tanh:
        pred = jnp.tanh(pred)
    return scale_pred(pred, cfg)[0]


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@functools.lru_cache(maxsize=16)
def _mv_parts(cfg: Config, stride: int, block: int, cell_cap_frac: float,
              band_factor: float):
    """Static sizes + jitted (phase_a, finish, dense_fn) for the multiview
    paths. Two-phase like infer/sparse._sparse_parts: phase_a returns the
    active count so the host buckets the fine pass to ~the real active set
    — a single-jit cap-sized fine pass decodes (and pays drop-scatter rows
    for) cell_cap*64 points per image whatever the object."""
    fine_r = cfg.grid_resolution
    rc = cfg.sdf_res // stride + 1
    c = rc - 1
    n_cells = c ** 3
    pts_per_cell = stride ** 3
    cell_cap = max(256, int(n_cells * cell_cap_frac))
    block = max(pts_per_cell, (block // pts_per_cell) * pts_per_cell)
    cells_per_block = block // pts_per_cell
    cell_cap = -(-cell_cap // cells_per_block) * cells_per_block
    max_blocks = cell_cap // cells_per_block
    coarse_total = -(-rc ** 3 // block) * block

    def grid_pts(sdf_params, fx, fy, fz):
        denom = jnp.float32(fine_r - 1)
        lo, hi = sdf_params[0:3], sdf_params[3:6]
        return jnp.stack([
            lo[0] + fx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
            lo[1] + fy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
            lo[2] + fz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
        ], axis=-1)

    @jax.jit
    def phase_a(params, imgs, trans_mats, sdf_params):
        from disn_tpu.infer import sparse as sparse_mod
        state = _mv_prep(params, imgs, cfg)

        def coarse_block(i):
            q = i * block + jnp.arange(block, dtype=jnp.int32)
            pts = grids.grid_block(sdf_params, rc, i * block, block)
            return jnp.where(q < rc ** 3,
                             _mv_decode(params, state, trans_mats, pts, cfg),
                             jnp.float32(1e6))

        vol_c = jax.lax.map(
            coarse_block,
            jnp.arange(coarse_total // block, dtype=jnp.int32)
        ).reshape(-1)[:rc ** 3].reshape(rc, rc, rc)
        cell_ids, count = sparse_mod._active_cells(
            vol_c,
            sparse_mod._band_tau(vol_c, sdf_params, rc, band_factor, cfg),
            cell_cap, mode="sign" if cfg.binary else "band")
        return state, vol_c, cell_ids, count

    @functools.partial(jax.jit, static_argnames=("n_blocks",))
    def finish(params, state, vol_c, cell_ids, count, trans_mats,
               sdf_params, n_blocks: int):
        from disn_tpu.infer import sparse as sparse_mod

        def fine_block(i):
            q = i * block + jnp.arange(block, dtype=jnp.int32)
            slot = q // pts_per_cell
            off = q % pts_per_cell
            block_cells = jax.lax.dynamic_slice_in_dim(
                cell_ids, i * cells_per_block, cells_per_block)
            cell = jnp.repeat(block_cells, pts_per_cell)
            cz = cell // (c * c)
            cy = (cell // c) % c
            cx = cell % c
            fx = cx * stride + off % stride
            fy = cy * stride + (off // stride) % stride
            fz = cz * stride + off // (stride * stride)
            vals = _mv_decode(params, state, trans_mats,
                              grid_pts(sdf_params, fx, fy, fz), cfg)
            flat = (fz * fine_r + fy) * fine_r + fx
            valid = slot < count
            return vals, jnp.where(valid, flat, fine_r ** 3)

        vals, flats = jax.lax.map(fine_block,
                                  jnp.arange(n_blocks, dtype=jnp.int32))
        vol = sparse_mod._upsample_aligned(vol_c, stride).reshape(-1)
        vol = vol.at[flats.reshape(-1)].set(
            vals.astype(jnp.float32).reshape(-1), mode="drop")

        # exact boundary planes only when an active cell touches them
        # (sparse.py:314-324 soundness argument)
        n_plane = fine_r * fine_r
        plane_total = -(-3 * n_plane // block) * block

        def plane_block(i):
            q = i * block + jnp.arange(block, dtype=jnp.int32)
            plane = q // n_plane
            r = q % n_plane
            a = r // fine_r
            b_ = r % fine_r
            last = fine_r - 1
            fx = jnp.where(plane == 2, last, b_)
            fy = jnp.where(plane == 0, a, jnp.where(plane == 1, last, b_))
            fz = jnp.where(plane == 0, last, a)
            v = _mv_decode(params, state, trans_mats,
                           grid_pts(sdf_params, fx, fy, fz), cfg)
            flat = (fz * fine_r + fy) * fine_r + fx
            return v, jnp.where(q < 3 * n_plane, flat, fine_r ** 3)

        kcz = cell_ids // (c * c)
        kcy = (cell_ids // c) % c
        kcx = cell_ids % c
        slot_ok = jnp.arange(cell_ids.shape[0], dtype=jnp.int32) < count
        n_boundary = jnp.sum(
            (slot_ok & ((kcx == c - 1) | (kcy == c - 1) | (kcz == c - 1))
             ).astype(jnp.int32))

        def decode_planes(vol):
            v, fl = jax.lax.map(
                plane_block,
                jnp.arange(plane_total // block, dtype=jnp.int32))
            return vol.at[fl.reshape(-1)].set(
                v.astype(jnp.float32).reshape(-1), mode="drop")

        vol = jax.lax.cond(n_boundary > 0, decode_planes, lambda v: v, vol)
        return vol.reshape(fine_r, fine_r, fine_r)

    dense_total = -(-fine_r ** 3 // block) * block

    @jax.jit
    def dense_fn(params, imgs, trans_mats, sdf_params):
        state = _mv_prep(params, imgs, cfg)

        def one(i):
            pts = grids.grid_block(sdf_params, fine_r, i * block, block)
            return _mv_decode(params, state, trans_mats, pts, cfg)

        vals = jax.lax.map(one, jnp.arange(dense_total // block,
                                           dtype=jnp.int32))
        return vals.reshape(dense_total)[:fine_r ** 3].reshape(
            fine_r, fine_r, fine_r)

    sizes = dict(cell_cap=cell_cap, cells_per_block=cells_per_block,
                 max_blocks=max_blocks)
    return sizes, phase_a, finish, dense_fn


def multiview_sdf_sparse(params: Params, imgs: np.ndarray,
                         trans_mats: np.ndarray, sdf_params: np.ndarray,
                         cfg: Config, block: int = 32768,
                         cell_cap_frac: float = 0.25,
                         band_factor: float = 1.5):
    """V views -> fused [R,R,R] SDF volume (DEVICE array) through the
    TWO-LEVEL sparse cull (the single-view production structure,
    infer/sparse.py): fused coarse grid at R/stride -> conservative active
    band (Lipschitz tau) -> fused fine decode only inside active cells,
    coarse lerp elsewhere, exact boundary planes when an active cell
    touches them. Returns None when the active set overflows the cell cap
    — the caller then takes the exact dense path.

    Two-phase: the one count sync (a tunnel round trip) buys a fine pass
    bucketed to the REAL active set — fusion runs per object (V views
    amortize one volume), so a ~26 ms sync against cap/count x the fine
    decode (~4x at cap_frac 0.25) is the right trade, unlike the
    single-image latency path's speculative ladder."""
    stride = cfg.sparse_stride
    if cfg.sdf_res % stride or cfg.sdf_res // stride < 2:
        return None
    sizes, phase_a, finish, _ = _mv_parts(cfg, stride, block,
                                          cell_cap_frac, band_factor)
    state, vol_c, cell_ids, count = phase_a(
        params, jnp.asarray(imgs), jnp.asarray(trans_mats),
        jnp.asarray(sdf_params))
    n_active = int(count)
    if n_active > sizes["cell_cap"]:
        return None
    n_blocks = min(sizes["max_blocks"],
                   _next_pow2(-(-max(1, n_active)
                                // sizes["cells_per_block"])))
    return finish(params, state, vol_c, cell_ids, count,
                  jnp.asarray(trans_mats), jnp.asarray(sdf_params),
                  n_blocks=n_blocks)


def multiview_sdf(params: Params, imgs: np.ndarray, trans_mats: np.ndarray,
                  sdf_params: np.ndarray, cfg: Config,
                  block: int = 32768) -> np.ndarray:
    """V views -> fused [R,R,R] SDF volume (dense streaming; DEVICE array).
    Exact-path fallback for cap overflows and non-stride grids; shares
    _mv_decode with the sparse path so both arms are bit-comparable."""
    _, _, _, dense_fn = _mv_parts(cfg, max(1, cfg.sparse_stride), block,
                                  0.25, 1.5)
    return dense_fn(params, jnp.asarray(imgs), jnp.asarray(trans_mats),
                    jnp.asarray(sdf_params))
