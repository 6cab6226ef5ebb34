"""Pallas TPU kernel: tiled multi-scale local-feature sampling.

The hot op of DISN inference (SURVEY.md §3.2): bilinearly sample C channels
from a VGG endpoint map at millions of projected query points. XLA lowers
point gathers to ~30ns-per-row latency-bound loops (measured: 4-29GB/s,
<4% HBM peak), so this kernel restructures the problem around locality:

* query points arrive in GROUPS of K (4x4x4 sub-cubes of the inference grid
  or of a sparse active cell) whose projected footprint is bounded by a
  static tile size T per scale;
* the endpoint map lives VMEM-RESIDENT for the whole kernel (every DISN
  endpoint map fits: conv1_2 224x224x64 bf16 = 6.4/12.8MB padded);
* per group, the [T, T, C] tile is read with cheap VMEM dynamic slices and
  the 4-tap bilinear interpolation is expressed as a one-hot weight matrix
  [K, T*T] multiplied on the MXU against the tile [T*T, C] — turning a
  latency-bound gather into dense matmul work.

Points whose taps fall outside their group tile are clamped to the tile edge;
callers guarantee the footprint bound (see group_points_footprint test) so
clamping only engages at the image border where the projector already clamps
(models/model_normalization.py:249-251).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(origins_ref, px_ref, map_ref, out_ref, *, T: int, K: int,
                   GB: int, C: int):
    """One grid step: GB groups of K points sampled from the resident map.

    origins_ref: SMEM [GB, 2] (oy, ox) int32 tile origins
    px_ref:      VMEM [GB, K, 2] float32 absolute pixel coords (x, y)
    map_ref:     VMEM [H, W, C] bf16/f32 (resident: same block every step)
    out_ref:     VMEM [GB, K, C] float32
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, T * T), 1)
    for g in range(GB):
        oy = origins_ref[g, 0]
        # W is the sublane dim of the VMEM layout: Mosaic requires provably
        # 8-aligned dynamic offsets there; origins are pre-aligned by the
        # wrapper and hinted here.
        ox = pl.multiple_of(origins_ref[g, 1], 8)
        tile = map_ref[pl.ds(oy, T), pl.ds(ox, T), :].reshape(T * T, C)
        lx = px_ref[g, :, 0] - ox.astype(jnp.float32)
        ly = px_ref[g, :, 1] - oy.astype(jnp.float32)
        x0 = jnp.clip(jnp.floor(lx), 0.0, T - 2.0)
        y0 = jnp.clip(jnp.floor(ly), 0.0, T - 2.0)
        tx = jnp.clip(lx - x0, 0.0, 1.0)[:, None]
        ty = jnp.clip(ly - y0, 0.0, 1.0)[:, None]
        base = (y0 * T + x0).astype(jnp.int32)[:, None]  # [K,1]
        w = ((cols == base) * (1 - tx) * (1 - ty)
             + (cols == base + 1) * tx * (1 - ty)
             + (cols == base + T) * (1 - tx) * ty
             + (cols == base + T + 1) * tx * ty)
        out_ref[g] = jnp.dot(w.astype(map_ref.dtype), tile,
                             preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "groups_per_block",
                                              "interpret"))
def tile_sample(fmap: jnp.ndarray, origins: jnp.ndarray, px: jnp.ndarray,
                tile: int, groups_per_block: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """Sample fmap [H,W,C] at px [G,K,2] (absolute (x,y) map coords, groups
    with footprint <= tile-1). origins [G,2] int32 (oy,ox), each in
    [0, dim-tile]. Returns [G,K,C] float32."""
    H, W, C = fmap.shape
    # pad W so every 8-aligned origin in [0, Wp-tile] exists (Mosaic sublane
    # alignment); padded cells are never tapped (coords clamp to w-1)
    Wp = max(-(-W // 8) * 8, tile)
    if Wp != W:
        fmap = jnp.pad(fmap, ((0, 0), (0, Wp - W), (0, 0)))
        W = Wp
    G, K, _ = px.shape
    GB = min(groups_per_block, G)
    pad = (-G) % GB
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 2), origins.dtype)])
        px = jnp.concatenate([px, jnp.zeros((pad, K, 2), px.dtype)])
        G = G + pad
    kernel = functools.partial(_sample_kernel, T=tile, K=K, GB=GB, C=C)
    grid = (G // GB,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((GB, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GB, K, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, K, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, K, C), jnp.float32),
        interpret=interpret,
    )(origins, px, fmap)
    return out[:G - pad] if pad else out


# --------------------------------------------------------------------------
# Multi-scale wrapper
# --------------------------------------------------------------------------

# (endpoint name, tile size in that map's pixel space). Usable span is
# tile - 8 (x origins align down to 8); it must bound the projected footprint
# of one query cube for IN-FRUSTUM groups (validated in tests for the
# ShapeNet camera range). Out-of-frustum groups (projection flips, clamped to
# the image border by the projector) exceed any tile and get tile-edge
# clamped — their features are border junk in the reference too and they are
# provably far from the iso-surface, so extracted meshes are unaffected.
DEFAULT_TILES = {
    "conv1_2": 32,   # 224-space
    "conv2_2": 24,   # 112-space
    "conv3_3": 16,   # 56-space
    "conv4_3": 16,   # 28-space
    "conv5_3": 16,   # 14-space (padded map: whole width)
}


def scale_coords(px137: jnp.ndarray, map_hw: tuple[int, int],
                 out_h: int = 137, out_w: int = 137) -> jnp.ndarray:
    """Map 137-space pixel coords to this endpoint map's native space using
    the TF1-legacy scale (src = dst * in/out), clamped inside the map."""
    h, w = map_hw
    s = jnp.asarray([w / out_w, h / out_h], px137.dtype)
    out = px137 * s
    hi = jnp.asarray([w - 1.0, h - 1.0], px137.dtype)
    return jnp.clip(out, 0.0, hi)


def group_origins(px: jnp.ndarray, tile: int, map_hw: tuple[int, int]
                  ) -> jnp.ndarray:
    """Tile origins [G,2] (oy,ox) from grouped coords [G,K,2]: floor of the
    group min, x aligned DOWN to 8 (Mosaic sublane alignment), clamped so the
    tile stays inside the (W-padded-to-8) map."""
    h, w = map_hw
    wp = max(-(-w // 8) * 8, tile)
    mins = jnp.floor(jnp.min(px, axis=1)).astype(jnp.int32)  # [G,2] (x,y)
    ox = jnp.clip((mins[:, 0] // 8) * 8, 0, max(wp - tile, 0))
    oy = jnp.clip(mins[:, 1], 0, max(h - tile, 0))
    return jnp.stack([oy, ox], axis=1)


def sample_multiscale(endpoints: dict[str, jnp.ndarray],
                      px137: jnp.ndarray, names: tuple[str, ...],
                      tiles: dict[str, int] | None = None,
                      groups_per_block: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """Grouped multi-scale sampling: px137 [G,K,2] -> [G,K,sum(C)].

    Equivalent to ops/image.sample_native per scale (same 4-tap clamped
    bilinear at TF1-scaled coords), restructured for locality.
    """
    tiles = tiles or DEFAULT_TILES
    feats = []
    for name in names:
        fmap = endpoints[name]
        if fmap.ndim == 4:
            fmap = fmap[0]
        hw = (fmap.shape[0], fmap.shape[1])
        t = min(tiles[name], *hw)
        pxs = scale_coords(px137, hw)
        org = group_origins(pxs, t, hw)
        feats.append(tile_sample(fmap, org, pxs, tile=t,
                                 groups_per_block=groups_per_block,
                                 interpret=interpret))
    return jnp.concatenate(feats, axis=-1)


# Optimization log (round 1, v5e): this kernel reaches ~7.9M pts/s for the
# 5-scale stack — parity with the XLA 4-tap gather path, not yet faster. A
# flat-layout variant (tiles assembled from [H*W, C] via aligned sublane
# slices, removing the [T,T,C]->[T*T,C] relayout) measured identical, a
# per-group scratch-slot variant regressed (VMEM pressure), and software
# prefetch reordering of the tile reads changed nothing (~3%), so the cost
# is NOT slice latency — suspect the one-hot build + small-matmul issue
# rate. Next candidates:
# software-pipelining tile loads against the previous group's matmul via
# double-buffered scratch + explicit make_async_copy, and fusing the
# two-stream MLP into the same kernel so sampled features never leave VMEM.
