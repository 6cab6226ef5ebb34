"""Production wiring for the fused Pallas decode kernel (ops/pallas_fused).

Provides EXACT cell-grouped decoding: the kernel evaluates every cell whose
projected footprint fits its tile (the overwhelming majority in-frustum);
the few escaped cells (behind-camera / perspective-flip regions, or synthetic
cameras whose w=0 plane cuts the box) are re-decoded in the same jit through
the reference XLA path and scattered over the kernel values. In f32 results
are bit-identical to infer/dense._decode_block for every cell (tested); in
bf16 both paths quantize weights/activations in different orders, so values
agree within a small tolerance rather than bitwise (tested too) — the same
class of drift bf16 introduces anywhere.

Used by infer/sparse.py (coarse pass + fine pass) and infer/dense.py (full
grid as all-cells) when the config resolves to the fold='137' decode
(twostream + tf1 sampling; see dense.normalize_fold).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.ops import pallas_fused

Params = dict[str, Any]

STRIDE = 4
K = STRIDE ** 3


def kernel_enabled(cfg: Config, fold: str, stride: int, fine_r: int,
                   strict: bool = True) -> bool:
    """The kernel path serves twostream+tf1 (fold='137') at stride 4 on
    grids fine enough that a cell's footprint fits a modest tile. It is
    compiled on TPU and interpreted elsewhere (tests).

    fused_kernel='on' RAISES when the main grid is ineligible instead of
    silently matching 'auto'; pass strict=False for opportunistic
    sub-checks (e.g. the small coarse pass inside the sparse pipeline)."""
    if cfg.fused_kernel == "off":
        return False
    ok = (fold == "137" and stride == STRIDE and fine_r - 1 >= 48
          and (fine_r - 1) % STRIDE == 0
          and cfg.img_w == 137 and cfg.img_h == 137)
    if strict and cfg.fused_kernel == "on" and not ok:
        raise ValueError(
            "fused_kernel='on' but the config is ineligible (needs "
            f"twostream+tf1 fold='137' (got {fold!r}), stride {STRIDE} "
            f"(got {stride}), grid >= 49 (got {fine_r}), 137x137 images); "
            "use 'auto' to fall back silently")
    return ok


def tiles_for(fine_r: int) -> tuple[int, int, int]:
    """(TX, TY, CB) so a stride-4 cell's projected footprint (~box_px * 4 /
    (fine_r-1), box_px <~ 137) fits the tile after 8-aligning the y origin.

    Tiles are sized for the TYPICAL footprint, not the worst case:
    perspective-magnified near-camera cells that overflow are caught by the
    per-cell escape flag and re-decoded exactly (the rescue loop), so a
    tight tile trades a little rescue work for a much cheaper main launch —
    at the 65^3 coarse pass (cells=16, footprint ~9 px) the (24,32)-tile
    launch ran 11.2 ms vs 7.5 for (16,24)+cb64 (round-3 probe, 4096 cells)."""
    cells = (fine_r - 1) // STRIDE
    if cells >= 48:
        return 8, 16, 32
    if cells >= 12:
        return 16, 24, 64
    return 24, 32, 32


def _cell_points(cell_ids: jnp.ndarray, coarse_c: int, fine_r: int,
                 sdf_params: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[n] cell ids -> ([n*K, 3] points, [n*K] flat fine-grid indices).
    Same enumeration as the kernel and infer/sparse's fine blocks."""
    c = coarse_c
    cell = jnp.repeat(cell_ids, K)
    off = jnp.tile(jnp.arange(K, dtype=jnp.int32), cell_ids.shape[0])
    cz = cell // (c * c)
    cy = (cell // c) % c
    cx = cell % c
    fx = cx * STRIDE + off % STRIDE
    fy = cy * STRIDE + (off // STRIDE) % STRIDE
    fz = cz * STRIDE + off // (STRIDE * STRIDE)
    denom = jnp.float32(fine_r - 1)
    lo = sdf_params[0:3]
    hi = sdf_params[3:6]
    pts = jnp.stack([
        lo[0] + fx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
        lo[1] + fy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
        lo[2] + fz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
    ], axis=-1)
    flat = (fz * fine_r + fy) * fine_r + fx
    return pts, flat


def decode_cells(params: Params, endpoints: dict, trans_mat: jnp.ndarray,
                 sdf_params: jnp.ndarray, cell_ids: jnp.ndarray, cfg: Config,
                 *, fine_r: int, coarse_c: int,
                 esc_cap: int | None = None) -> tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Decode every stride^3 point of `cell_ids` ([n] int32).

    Returns (vals [n*K] f32 — scaled SDF, exact vs dense._decode_block —
    and esc_over [] int32: >0 when more than esc_cap cells escaped their
    tiles, in which case the caller must fall back entirely).
    """
    from disn_tpu.infer import dense as dense_mod

    (n,) = cell_ids.shape
    if esc_cap is None:
        esc_cap = max(256, min(n // 2, 8192))
    esc_cap = -(-esc_cap // 256) * 256
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    tx_t, ty_t, cb = tiles_for(fine_r)
    interpret = jax.default_backend() != "tpu"

    m2d = pallas_fused.prep_map(endpoints["fold137"], ty_t)
    wpack = pallas_fused.pack_weights(params, endpoints["g_contrib"], cd)
    out_dim = 2 if cfg.binary else 1
    raw, esc = pallas_fused.fused_cell_decode(
        m2d, wpack, trans_mat, sdf_params, cell_ids,
        stride=STRIDE, fine_r=fine_r, coarse_c=coarse_c,
        tx_t=tx_t, ty_t=ty_t, cb=cb, img_w=cfg.img_w, img_h=cfg.img_h,
        out_dim=out_dim, interpret=interpret)
    pred = raw[None]  # [1, n*K, O]
    if cfg.tanh:
        pred = jnp.tanh(pred)
    vals = dense_mod.scale_pred(pred, cfg)[0]  # [n*K]

    # rescue escaped cells through the exact XLA path, in the same jit but
    # under lax.cond: with in-frustum cameras (real ShapeNet) no cell
    # escapes and the rescue branch never executes. The block loop is a
    # fori_loop with a DYNAMIC trip count — synthetic cameras whose w=0
    # plane cuts the box escape ~10% of active cells, and a static
    # esc_cap-sized map was re-decoding 524k masked points (~15 ms/image
    # at 257^3, round-3 probe) where ~7 blocks of real work sufficed
    esc_mask = esc > 0
    esc_count = jnp.sum(esc_mask.astype(jnp.int32))
    cells_per_blk = 256  # bounds the gather intermediate (~16K pts)

    def rescue(vals):
        csum = jnp.cumsum(esc_mask.astype(jnp.int32))
        slot_of = jnp.where(esc_mask, csum - 1, esc_cap)
        resc_pos = jnp.zeros((esc_cap,), jnp.int32).at[slot_of].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        resc_cells = jnp.take(cell_ids, resc_pos)
        pts, _ = _cell_points(resc_cells, coarse_c, fine_r, sdf_params)
        offk = jnp.tile(jnp.arange(K, dtype=jnp.int32), cells_per_blk)
        slot = jnp.arange(cells_per_blk * K, dtype=jnp.int32) // K

        def body(i, v):
            p = jax.lax.dynamic_slice_in_dim(pts, i * cells_per_blk * K,
                                             cells_per_blk * K)
            rv = dense_mod._decode_block(params, endpoints, None,
                                         trans_mat, p, cfg, folded="137")
            pos_blk = jax.lax.dynamic_slice_in_dim(
                resc_pos, i * cells_per_blk, cells_per_blk)
            dst = jnp.repeat(pos_blk, K) * K + offk
            dst = jnp.where(i * cells_per_blk + slot < esc_count,
                            dst, n * K)
            return v.at[dst].set(rv, mode="drop")

        n_blk = jnp.minimum(-(-esc_count // cells_per_blk),
                            esc_cap // cells_per_blk)
        return jax.lax.fori_loop(0, n_blk, body, vals)

    vals = jax.lax.cond(esc_count > 0, rescue, lambda v: v, vals)
    return vals, jnp.maximum(esc_count - esc_cap, 0)


def dense_grid_via_cells(params: Params, endpoints: dict,
                         trans_mat: jnp.ndarray, sdf_params: jnp.ndarray,
                         resolution: int, cfg: Config,
                         plane_block: int = 65536
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full [R,R,R] volume: interior points via the kernel over ALL
    (R-1)/4^3 cells, the three R-1 boundary planes via the XLA path.
    Returns (volume, esc_over)."""
    from disn_tpu.infer import dense as dense_mod

    assert (resolution - 1) % STRIDE == 0, resolution
    c = (resolution - 1) // STRIDE
    cell_ids = jnp.arange(c ** 3, dtype=jnp.int32)
    vals, esc_over = decode_cells(params, endpoints, trans_mat, sdf_params,
                                  cell_ids, cfg, fine_r=resolution,
                                  coarse_c=c)
    _, flats = _cell_points(cell_ids, c, resolution, sdf_params)
    vol = jnp.full((resolution ** 3,), jnp.nan, jnp.float32)
    vol = vol.at[flats].set(vals, mode="drop")

    # boundary planes z=R-1, y=R-1, x=R-1 (same scheme as infer/sparse).
    # Tighten the block to the real point count: the coarse pass (rc=65)
    # has only 12,675 plane points, and a 65536 pad decoded 5x the work
    # through the gather-bound XLA path (1.87 -> 0.41 ms, probe_phase_a)
    n_plane = resolution * resolution
    plane_block = min(plane_block, -(-3 * n_plane // 256) * 256)
    total = -(-3 * n_plane // plane_block) * plane_block

    def plane(i):
        q = i * plane_block + jnp.arange(plane_block, dtype=jnp.int32)
        which = q // n_plane
        r = q % n_plane
        a = r // resolution
        b = r % resolution
        last = resolution - 1
        fx = jnp.where(which == 2, last, b)
        fy = jnp.where(which == 0, a, jnp.where(which == 1, last, b))
        fz = jnp.where(which == 0, last, a)
        denom = jnp.float32(resolution - 1)
        lo = sdf_params[0:3]
        hi = sdf_params[3:6]
        pts = jnp.stack([
            lo[0] + fx.astype(jnp.float32) / denom * (hi[0] - lo[0]),
            lo[1] + fy.astype(jnp.float32) / denom * (hi[1] - lo[1]),
            lo[2] + fz.astype(jnp.float32) / denom * (hi[2] - lo[2]),
        ], axis=-1)
        v = dense_mod._decode_block(params, endpoints, None, trans_mat, pts,
                                    cfg, folded="137")
        flat = (fz * resolution + fy) * resolution + fx
        return v, jnp.where(q < 3 * n_plane, flat, resolution ** 3)

    pv, pf = jax.lax.map(plane, jnp.arange(total // plane_block,
                                           dtype=jnp.int32))
    vol = vol.at[pf.reshape(-1)].set(pv.reshape(-1), mode="drop")
    return vol.reshape(resolution, resolution, resolution), esc_over
