"""Multi-view fused reconstruction (reference --multi_view path:
placeholder_features + get_decoder, models/model_normalization.py:38-45,
84-90, 223-238).

Each of V views is encoded once; per query point, the global embedding and
the per-view local features (sampled through each view's own trans_mat) are
AVERAGED in feature space, then decoded by the same two MLP streams
(disn.decode_from_features). Views vectorize with vmap — the TPU-native
replacement for the reference's per-view feed_dict loop.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from disn_tpu.config import Config, Variant
from disn_tpu.core import camera, grids
from disn_tpu.models import disn, vgg
from disn_tpu.ops import image as image_ops

Params = dict[str, Any]


def encode_views(params: Params, imgs: jnp.ndarray, cfg: Config):
    """imgs [V,H,W,C] -> (embeddings [V,G], endpoints dict of [V,h,w,c])."""
    return disn.encode(params, imgs, cfg)


def fused_point_features(endpoints: dict[str, jnp.ndarray],
                         pts: jnp.ndarray, trans_mats: jnp.ndarray,
                         cfg: Config) -> jnp.ndarray:
    """Per-point local features averaged over views: [N, local_dim].

    pts [N,3]; trans_mats [V,4,3]; endpoints carry a leading view axis."""
    from disn_tpu.models import disn as _disn
    names = _disn.endpoint_names(cfg)

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


def _mv_decode(params: Params, endpoints, fused_embedding,
               trans_mats: jnp.ndarray, pts: jnp.ndarray, cfg: Config
               ) -> jnp.ndarray:
    """Fused multiview decode of [N,3] world points -> [N] scaled SDF."""
    local = fused_point_features(endpoints, pts, trans_mats, cfg)
    pred = disn.decode_from_features(
        params, pts[None], fused_embedding, local[None], cfg)
    if cfg.tanh:
        pred = jnp.tanh(pred)
    from disn_tpu.infer.dense import scale_pred
    return scale_pred(pred, cfg)[0]


def multiview_sdf_sparse(params: Params, imgs: np.ndarray,
                         trans_mats: np.ndarray, sdf_params: np.ndarray,
                         cfg: Config, block: int = 32768,
                         cell_cap_frac: float = 0.25,
                         band_factor: float = 1.5
                         ) -> np.ndarray | None:
    """V views -> fused [R,R,R] SDF volume through the TWO-LEVEL sparse
    cull (the single-view production structure, infer/sparse.py): fused
    coarse grid at R/stride -> conservative active band (Lipschitz tau) ->
    fused fine decode only inside active cells, coarse lerp elsewhere,
    exact boundary planes when an active cell touches them. ~16x fewer
    decoded points than the dense streamer at 257^3 (the round-4 verdict's
    multiview cost item). Returns None when the active set overflows the
    cell cap — the caller then takes the exact dense path.

    Single-jit (the fine pass always runs the cap) like
    make_sparse_dense_sdf_fn: fusion runs per OBJECT (V views amortize
    one volume), so the latency machinery's bucket ladder isn't worth its
    compile surface here."""
    from disn_tpu.infer import sparse as sparse_mod

    stride = cfg.sparse_stride
    fine_r = cfg.grid_resolution
    if cfg.sdf_res % stride or cfg.sdf_res // stride < 2:
        return None
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

    @jax.jit
    def fn(params, imgs, trans_mats, sdf_params):
        embeddings, endpoints = encode_views(params, imgs, cfg)
        fused_embedding = jnp.mean(embeddings, axis=0, keepdims=True)

        def grid_pts(fx, fy, fz):
            denom = jnp.float32(fine_r - 1)
            lo, hi = sdf_params[0:3], sdf_params[3:6]
            return jnp.stack([
                lo[0] + fx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
                lo[1] + fy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
                lo[2] + fz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
            ], axis=-1)

        def decode(pts):
            return _mv_decode(params, endpoints, fused_embedding,
                              trans_mats, pts, cfg)

        def coarse_block(i):
            q = i * block + jnp.arange(block, dtype=jnp.int32)
            pts = grids.grid_block(sdf_params, rc, i * block, block)
            return jnp.where(q < rc ** 3, decode(pts), jnp.float32(1e6))

        vol_c = jax.lax.map(
            coarse_block,
            jnp.arange(coarse_total // block, dtype=jnp.int32)
        ).reshape(-1)[:rc ** 3].reshape(rc, rc, rc)

        cell_ids, count = sparse_mod._active_cells(
            vol_c,
            sparse_mod._band_tau(vol_c, sdf_params, rc, band_factor, cfg),
            cell_cap, mode="sign" if cfg.binary else "band")

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
            vals = decode(grid_pts(fx, fy, fz))
            flat = (fz * fine_r + fy) * fine_r + fx
            valid = slot < count
            return vals, jnp.where(valid, flat, fine_r ** 3)

        vals, flats = jax.lax.map(fine_block,
                                  jnp.arange(max_blocks, dtype=jnp.int32))
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
            v = decode(grid_pts(fx, fy, fz))
            flat = (fz * fine_r + fy) * fine_r + fx
            return v, jnp.where(q < 3 * n_plane, flat, fine_r ** 3)

        kcz = cell_ids // (c * c)
        kcy = (cell_ids // c) % c
        kcx = cell_ids % c
        slot_ok = jnp.arange(cell_ids.shape[0], dtype=jnp.int32) < count
        n_boundary = jnp.sum((slot_ok & ((kcx == c - 1) | (kcy == c - 1)
                                         | (kcz == c - 1))).astype(jnp.int32))

        def decode_planes(vol):
            v, fl = jax.lax.map(
                plane_block,
                jnp.arange(plane_total // block, dtype=jnp.int32))
            return vol.at[fl.reshape(-1)].set(
                v.astype(jnp.float32).reshape(-1), mode="drop")

        vol = jax.lax.cond(n_boundary > 0, decode_planes,
                           lambda vol: vol, vol)
        return vol.reshape(fine_r, fine_r, fine_r), count

    vol, count = fn(params, jnp.asarray(imgs), jnp.asarray(trans_mats),
                    jnp.asarray(sdf_params))
    if int(count) > cell_cap:
        return None
    return np.asarray(vol)


def multiview_sdf(params: Params, imgs: np.ndarray, trans_mats: np.ndarray,
                  sdf_params: np.ndarray, cfg: Config,
                  block: int = 32768) -> np.ndarray:
    """V views -> fused [R,R,R] SDF volume (dense streaming)."""
    resolution = cfg.grid_resolution
    total = resolution ** 3
    padded = -(-total // block) * block

    @jax.jit
    def fn(params, imgs, trans_mats, sdf_params):
        embeddings, endpoints = encode_views(params, imgs, cfg)
        fused_embedding = jnp.mean(embeddings, axis=0, keepdims=True)

        def one(i):
            pts = grids.grid_block(sdf_params, resolution, i * block, block)
            local = fused_point_features(endpoints, pts, trans_mats, cfg)
            pred = disn.decode_from_features(
                params, pts[None], fused_embedding, local[None], cfg)
            if cfg.tanh:
                pred = jnp.tanh(pred)
            from disn_tpu.infer.dense import scale_pred
            return scale_pred(pred, cfg)[0]

        vals = jax.lax.map(one, jnp.arange(padded // block, dtype=jnp.int32))
        return vals.reshape(padded)[:total].reshape(
            resolution, resolution, resolution)

    return np.asarray(fn(params, jnp.asarray(imgs), jnp.asarray(trans_mats),
                         jnp.asarray(sdf_params)))
