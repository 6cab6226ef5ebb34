"""Dense-grid SDF inference: the latency path (image -> (res+1)^3 SDF volume).

Re-imagines test/create_sdf.py:224-289. The reference pads the 16.97M-point
256^3 grid to 79 sequential 214,669-point sess.runs chosen to fit GPU memory.
Here the grid never materializes at all:

* the image is encoded ONCE; per-point local features are sampled straight
  from the ORIGINAL multi-scale VGG endpoint maps with composed
  resize-then-resample coefficients (ops/image.resize_then_sample) — the five
  original maps total ~12 MB in bf16 and stay on-chip, while the reference's
  materialized 137x137x1472 resized stack would be ~110 MB;
* grid points are generated on the fly per block from the flat index
  (core/grids.grid_block) and streamed through project -> sample -> two-stream
  MLP under lax.map — XLA double-buffers blocks through VMEM;
* across chips the flat point axis is sharded over the mesh 'points' axis with
  shard_map (SURVEY.md §2.9 P3): every device computes its own slab offset
  from axis_index, no collectives until the slabs are gathered (and none at
  all when each chip keeps its slab).

Prediction scaling matches the reference (create_sdf.py:279-285): regression
head -> pred/10, binary head -> (softmax_1 - 0.5)/10.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from disn_tpu.config import Config, Variant
from disn_tpu.core import camera, grids
from disn_tpu.models import disn, sdfnet, vgg
from disn_tpu.ops import image as image_ops
from disn_tpu.parallel.mesh import POINT_AXIS

Params = dict[str, Any]


def scale_pred(pred: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Map raw head output to SDF value (create_sdf.py:279-285)."""
    if cfg.binary:
        return (jax.nn.softmax(pred, axis=-1)[..., 1] - 0.5) / cfg.sdf_weight
    return pred[..., 0] / cfg.sdf_weight


def normalize_fold(fold, cfg: Config) -> str:
    """Resolve a fold mode: 'none' | 'local' | '137' (bool/None accepted).

    '137' exploits that the reference's tf1 sampling composition
    (resize-to-137 THEN resample, model_normalization.py:171-185) samples
    every scale at the SAME 137-space coordinates, and both resize and
    resampling are linear in the map values:

        concat_s(sample(resize(m_s))) @ W_local
            == sum_s sample(resize(m_s)) @ W_s
            == sample( sum_s resize(m_s @ W_s) )

    so the five endpoint maps and the per-point 1472->512 matmul collapse
    into ONE [137,137,512] map built once per image (~10 GFLOP of MXU work).
    Per-point sampling drops from 20 gather taps (5888 values) to 4 taps
    (2048 values). Only the tf1 sampling mode has a single shared coordinate
    space; 'native' samples each original map at its own scale and cannot
    merge, so it defaults to the unfolded path."""
    if fold is None or fold == "auto":
        return ("137" if (cfg.variant is Variant.TWOSTREAM
                          and cfg.sampling == "tf1") else "none")
    if fold is True:
        return "local"
    if fold is False:
        return "none"
    assert fold in ("none", "local", "137"), fold
    return fold


def _decode_block(params: Params, endpoints: dict[str, jnp.ndarray],
                  embedding: jnp.ndarray, trans_mat: jnp.ndarray,
                  pts: jnp.ndarray, cfg: Config,
                  folded: str = "none") -> jnp.ndarray:
    """[P,3] points -> [P] sdf values for one image (no batch dim).

    folded='local' expects endpoints pre-multiplied by the local-stream fold2
    weight slices (_prep(fold='local')): the per-point 1472->512 matmul
    disappears and per-scale samples SUM instead of concatenating.
    folded='137' expects the single merged 137-space map + per-image global
    contribution from _prep(fold='137') (see normalize_fold)."""
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    pts_b = pts[None]  # [1,P,3]
    if cfg.variant in (Variant.TWOSTREAM, Variant.ONESTREAM):
        px = camera.project_points(pts_b, trans_mat[None],
                                   img_w=cfg.img_w, img_h=cfg.img_h)
        names = disn.endpoint_names(cfg)
        sample = (image_ops.sample_native if cfg.sampling == "native"
                  else image_ops.resize_then_sample)
        if folded == "137" and cfg.variant is Variant.TWOSTREAM:
            local_contrib = image_ops.resampler(endpoints["fold137"], px)
            pred = sdfnet.apply_two_stream_prefold(
                params["sdfprediction"], params["sdfprediction_imgfeat"],
                pts_b, endpoints["g_contrib"], local_contrib, cd)
        elif folded == "local" and cfg.variant is Variant.TWOSTREAM:
            contrib = None
            for n in names:
                s = sample(endpoints[n], px, cfg.img_h, cfg.img_w)
                contrib = s if contrib is None else contrib + s
            pred = (sdfnet.apply_global_head(
                        params["sdfprediction"], pts_b, embedding, cd)
                    + sdfnet.apply_local_head_folded(
                        params["sdfprediction_imgfeat"], pts_b, contrib, cd))
        elif cfg.variant is Variant.TWOSTREAM:
            # split-matmul decode: per-scale samples feed fold2 directly;
            # no [N, 1984] concat buffer materializes (see
            # sdfnet.apply_two_stream_split)
            feats = [sample(endpoints[n], px, cfg.img_h, cfg.img_w)
                     for n in names]
            pred = sdfnet.apply_two_stream_split(
                params["sdfprediction"], params["sdfprediction_imgfeat"],
                pts_b, embedding, feats, cd)
        else:
            local = jnp.concatenate([
                sample(endpoints[n], px, cfg.img_h, cfg.img_w)
                for n in names], axis=-1)
            pred = sdfnet.apply_onestream_head(
                params["sdfimgfeat"], pts_b, embedding, local, cd)
    elif cfg.variant is Variant.GLOBAL:
        pred = sdfnet.apply_global_head(params["sdfprediction"], pts_b,
                                        embedding, cd)
    else:
        raise ValueError("THREEDCNN decodes a fixed volume; use apply_3dcnn_head")
    if cfg.tanh:
        pred = jnp.tanh(pred)
    return scale_pred(pred, cfg)[0]


def _stream_blocks(params, endpoints, embedding, trans_mat, sdf_params,
                   cfg: Config, start: jnp.ndarray, count: int,
                   block: int, folded: str = "none") -> jnp.ndarray:
    """SDF values for flat grid indices [start, start+count) in `block` steps."""
    n_blocks = count // block
    resolution = cfg.grid_resolution

    def one(i):
        pts = grids.grid_block(sdf_params, resolution, start + i * block, block)
        return _decode_block(params, endpoints, embedding, trans_mat, pts,
                             cfg, folded=folded)

    vals = jax.lax.map(one, jnp.arange(n_blocks, dtype=jnp.int32))
    return vals.reshape(count)


def _prep(params: Params, img: jnp.ndarray, cfg: Config,
          fold_local: str = "none"):
    """Encode the image once; cast endpoint maps to the compute dtype.

    fold_local='local' pre-multiplies each endpoint map by its slice of the
    local stream's fold2/conv1 weight (legal because feature sampling is
    linear in the map values; ~6 GFLOP once per image) — the per-point
    1472->512 matmul then vanishes from the hot loop (-34% point FLOPs).
    fold_local='137' additionally resizes each folded map to the shared
    137-space and SUMS them into one [1,137,137,512] map (see
    normalize_fold): per-point work becomes 4 gather taps + pure point MLP.
    The per-image global-stream contribution embedding @ W_g[512:] is also
    precomputed here."""
    embedding, endpoints = disn.encode(params, img, cfg)
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    keep = disn.endpoint_names(cfg)
    if fold_local in ("local", "137") and cfg.variant is Variant.TWOSTREAM:
        _, w_local = sdfnet.split_local_fold2(params["sdfprediction_imgfeat"])
        w_local = w_local.astype(cd)
        out = {}
        off = 0
        for n in keep:
            c = endpoints[n].shape[-1]
            out[n] = jnp.einsum(
                "bhwc,cd->bhwd", endpoints[n].astype(cd),
                w_local[off:off + c])
            off += c
        if fold_local == "local":
            return embedding, out
        merged = None
        for n in keep:
            r = image_ops.resize_bilinear(out[n], cfg.img_h, cfg.img_w)
            merged = r if merged is None else merged + r
        wg = params["sdfprediction"]["fold2"]["conv1"]["weights"]
        g_contrib = jax.lax.dot_general(
            embedding.astype(cd), wg[512:].astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())))
        return embedding, {"fold137": merged, "g_contrib": g_contrib}
    endpoints = {n: endpoints[n].astype(cd) for n in keep}
    return embedding, endpoints


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def make_dense_sdf_fn(cfg: Config, block: int = 65536,
                      fold_local: bool | str | None = None):
    """Single-device jitted fn: (params, img[1,H,W,C], trans_mat[4,3],
    sdf_params[6]) -> [R,R,R] float32 volume (z,y,x indexed, x fastest).

    fold_local (see normalize_fold): None resolves to '137' for
    twostream+tf1 (the production fast path), else 'none'. 'local' folds the
    weight into the per-scale maps but uniformizes every gather row to 512
    channels (~1.7x gather traffic) — measured SLOWER on v5e where XLA
    gathers are the bottleneck (3.13s vs 2.38s at 257^3); kept for the
    Pallas tiled-sampler path."""
    resolution = cfg.grid_resolution
    total = resolution ** 3
    block = min(block, _round_up(total, 8))
    padded = _round_up(total, block)
    fold = normalize_fold(fold_local, cfg)
    from disn_tpu.infer import fused
    use_kernel = fused.kernel_enabled(cfg, fold, fused.STRIDE, resolution)

    @jax.jit
    def fn(params, img, trans_mat, sdf_params):
        embedding, endpoints = _prep(params, img, cfg, fold_local=fold)
        if use_kernel:
            vol, esc_over = fused.dense_grid_via_cells(
                params, endpoints, trans_mat, sdf_params, resolution, cfg,
                plane_block=block)
            # escaped cells beyond the rescue cap would be junk; guarantee
            # exactness by re-decoding the whole grid on the XLA path then
            # (lax.cond: free unless a pathological camera triggers it)
            def exact(_):
                vals = _stream_blocks(params, endpoints, embedding,
                                      trans_mat, sdf_params, cfg,
                                      jnp.int32(0), padded, block,
                                      folded=fold)
                return vals[:total].astype(jnp.float32).reshape(
                    (resolution,) * 3)

            return jax.lax.cond(esc_over > 0, exact, lambda _: vol, 0)
        vals = _stream_blocks(params, endpoints, embedding, trans_mat,
                              sdf_params, cfg, jnp.int32(0), padded, block,
                              folded=fold)
        return vals[:total].reshape(resolution, resolution, resolution)

    return fn


@functools.lru_cache(maxsize=8)
def make_sharded_dense_sdf_fn(cfg: Config, mesh: Mesh, block: int = 65536):
    """Multi-chip jitted fn: the flat grid index space is split into equal
    contiguous slabs over the mesh 'points' axis; every device streams its own
    slab (image features replicated). Output is a global [R,R,R] array sharded
    along z — gather it (or write per-slab) downstream."""
    resolution = cfg.grid_resolution
    total = resolution ** 3
    # EVERY device of the mesh works a slab, including the data axis of a 2D
    # (data, points) eval-farm mesh: the linear device index runs row-major
    # over all axes, matching the stacked out_specs order
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    block = min(block, _round_up(-(-total // n_dev), 8))
    per_dev = _round_up(-(-total // n_dev), block)
    padded = per_dev * n_dev

    fold = normalize_fold(None, cfg)

    def worker(params, img, trans_mat, sdf_params):
        embedding, endpoints = _prep(params, img, cfg, fold_local=fold)
        idx = jax.lax.axis_index(axes)
        start = idx * per_dev
        vals = _stream_blocks(params, endpoints, embedding, trans_mat,
                              sdf_params, cfg, start, per_dev, block,
                              folded=fold)
        return vals[None]  # [1, per_dev] -> concatenates over devices

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axes),
        check_vma=False,
    )

    @jax.jit
    def fn(params, img, trans_mat, sdf_params):
        vals = sharded(params, img, trans_mat, sdf_params).reshape(padded)
        return vals[:total].reshape(resolution, resolution, resolution)

    return fn


def dense_sdf(params: Params, img: np.ndarray, trans_mat: np.ndarray,
              sdf_params: np.ndarray, cfg: Config, block: int = 65536,
              mesh: Mesh | None = None,
              device_out: bool = False) -> np.ndarray:
    """Convenience wrapper. device_out=True keeps the volume on device so a
    downstream on-device consumer (marching tets) avoids the host round trip
    — on tunneled TPU hosts the 67MB volume transfer costs seconds."""
    if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
        fn = make_sharded_dense_sdf_fn(cfg, mesh, block)
        params = jax.device_put(params, NamedSharding(mesh, P()))
    else:
        fn = make_dense_sdf_fn(cfg, block)
    vol = fn(params, jnp.asarray(img), jnp.asarray(trans_mat),
             jnp.asarray(sdf_params))
    return vol if device_out else np.asarray(vol)
