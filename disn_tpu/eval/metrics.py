"""Evaluation metrics: Chamfer, approx-EMD, F-score, voxel IoU.

TPU-native re-implementations of the reference's CUDA custom ops and pymesh
pipelines. All pairwise work rides the MXU as dense [N, M] Gram matrices —
at the protocol's N = M = 2048 (test/test_cd_emd.py:232) a full distance
matrix is 4M floats, ideal MXU shape, no custom kernel required.

* nn_distance: both-direction squared NN distances + argmins with the same
  output contract and custom gradient as the reference op
  (models/tf_ops/nn_distance/tf_nndistance.py:14-37).
* approx_match / match_cost: the auction-style soft matching — 10 temperature
  levels -4^j for j = 7..-1 then 0, three normalization phases per level —
  with MatchCost's gradient (models/tf_ops/approxmatch/tf_approxmatch_g.cu,
  tf_approxmatch.py:45-51).
* f_score: precision/recall at {0.5,1,2,5,10,20}% x side_len thresholds
  (test/test_f_score.py:159-181).
* iou_volumes: voxel IoU on occupancy grids (test/test_iou.py:208-233); mesh
  voxelization lives in ops/voxelize.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[.., N, 3] x [.., M, 3] -> [.., N, M] squared distances (MXU Gram)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.einsum("...nc,...mc->...nm", a, b,
                    preferred_element_type=jnp.float32)
    return jnp.maximum(a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2), 0.0)


@jax.custom_vjp
def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Chamfer components: (dist1 [B,N], idx1, dist2 [B,M], idx2), squared
    distances to the nearest neighbor in the other cloud."""
    d = _pairwise_sqdist(xyz1, xyz2)
    return (jnp.min(d, -1), jnp.argmin(d, -1).astype(jnp.int32),
            jnp.min(d, -2), jnp.argmin(d, -2).astype(jnp.int32))


def _nn_fwd(xyz1, xyz2):
    out = nn_distance(xyz1, xyz2)
    return out, (xyz1, xyz2, out[1], out[3])


def _nn_bwd(res, g):
    """Mirrors the registered gradient of the reference op
    (tf_nndistance_g.cu:132-160): d(dist1)/d(xyz1) = 2 (x1 - x2[idx1]) etc.
    idx gradients are zero."""
    xyz1, xyz2, idx1, idx2 = res
    g1, _, g2, _ = g
    n1 = jnp.take_along_axis(xyz2, idx1[..., None], axis=-2)
    n2 = jnp.take_along_axis(xyz1, idx2[..., None], axis=-2)
    grad1 = 2.0 * g1[..., None] * (xyz1 - n1)
    grad2 = 2.0 * g2[..., None] * (xyz2 - n2)
    # backward-direction terms scatter into the opposite cloud
    grad1 = grad1 + jnp.zeros_like(xyz1).at[
        jnp.arange(xyz1.shape[0])[:, None], idx2].add(
        2.0 * g2[..., None] * (n2 - xyz2))
    grad2 = grad2 + jnp.zeros_like(xyz2).at[
        jnp.arange(xyz2.shape[0])[:, None], idx1].add(
        2.0 * g1[..., None] * (n1 - xyz1))
    return grad1, grad2


nn_distance.defvjp(_nn_fwd, _nn_bwd)


def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Auction-style soft matching [B, M, N] (match[l, k] = mass moved from
    xyz1[k] to xyz2[l]), faithful to approxmatch (tf_approxmatch_g.cu:1-180).

    xyz1 [B,N,3] predicted, xyz2 [B,M,3] ground truth. remainL starts at
    max(1, m//n), remainR at max(1, n//m) (integer ratios like the CUDA).
    """
    n = xyz1.shape[-2]
    m = xyz2.shape[-2]
    multi_l = float(max(1, m // n))
    multi_r = float(max(1, n // m))
    d = _pairwise_sqdist(xyz1, xyz2)  # [B,N,M]

    remain_l0 = jnp.full(xyz1.shape[:-1], multi_l, jnp.float32)
    remain_r0 = jnp.full(xyz2.shape[:-1], multi_r, jnp.float32)
    match0 = jnp.zeros(d.shape, jnp.float32)
    levels = [-np.power(4.0, j) for j in range(7, -2, -1)] + [0.0]

    def one_level(carry, level):
        match, remain_l, remain_r = carry
        e = jnp.exp(level * d)  # [B,N,M]
        # phase 1: row ratios
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", e, remain_r)
        ratio_l = remain_l / suml
        # phase 2: column consumption
        sumr = jnp.einsum("bnm,bn->bm", e, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # phase 3: transported mass
        w = e * ratio_l[..., :, None] * ratio_r[..., None, :]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=-1))
        return (match, remain_l, remain_r), None

    (match, _, _), _ = jax.lax.scan(
        one_level, (match0, remain_l0, remain_r0),
        jnp.asarray(levels, jnp.float32))
    return jnp.swapaxes(match, -1, -2)  # [B,M,N] like the reference op


@jax.custom_vjp
def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
               match: jnp.ndarray) -> jnp.ndarray:
    """[B] total transport cost sum(match[l,k] * |x1_k - x2_l|) — EUCLIDEAN
    distance, not squared (matchcost kernel, tf_approxmatch_g.cu:183-227)."""
    d = jnp.sqrt(_pairwise_sqdist(xyz2, xyz1))  # [B,M,N]
    return jnp.sum(match * d, axis=(-1, -2))


def _mc_fwd(xyz1, xyz2, match):
    return match_cost(xyz1, xyz2, match), (xyz1, xyz2, match)


def _mc_bwd(res, g):
    """Gradient wrt xyz1/xyz2 only (match treated constant), matching the
    reference's MatchCostGrad (tf_approxmatch.py:45-51)."""
    xyz1, xyz2, match = res
    diff = xyz1[:, None, :, :] - xyz2[:, :, None, :]      # [B,M,N,3]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1, keepdims=True))
    unit = diff / jnp.maximum(dist, 1e-12)
    w = match[..., None] * unit                            # [B,M,N,3]
    g1 = g[:, None, None] * jnp.sum(w, axis=1)             # [B,N,3]
    g2 = -g[:, None, None] * jnp.sum(w, axis=2)            # [B,M,3]
    return g1, g2, None


match_cost.defvjp(_mc_fwd, _mc_bwd)


@functools.partial(jax.jit, static_argnames=())
def chamfer_emd(pred: jnp.ndarray, gt: jnp.ndarray
                ) -> dict[str, jnp.ndarray]:
    """The reference evaluation pair (test/test_cd_emd.py:291-315):
    cd = (mean d_fwd + mean d_bwd) * 1000 on SQUARED distances,
    emd = match_cost * 0.01. pred/gt: [B,N,3]/[B,M,3]."""
    d1, _, d2, _ = nn_distance(pred, gt)
    cd = (jnp.mean(d1, -1) + jnp.mean(d2, -1)) * 1000.0
    # protocol order: the reference feeds GT as xyz1 (test_cd_emd.py:307-308)
    # and the auction matcher is asymmetric in its arguments
    m = approx_match(gt, pred)
    emd = match_cost(gt, pred, m) * 0.01
    return {"cd": cd, "emd": emd}


@jax.jit
def f_score(pred: jnp.ndarray, gt: jnp.ndarray, thresholds: np.ndarray
            ) -> dict[str, jnp.ndarray]:
    """Precision/recall/F1 at distance thresholds (test_f_score.py:159-181).
    Distances are EUCLIDEAN here (reference square-roots its cached nn
    distances, test_f_score.py:222-227). pred/gt: [B,N,3]."""
    d1, _, d2, _ = nn_distance(pred, gt)
    d1 = jnp.sqrt(d1)
    d2 = jnp.sqrt(d2)
    th = jnp.asarray(thresholds, jnp.float32)[:, None, None]
    precision = jnp.mean((d1[None] < th).astype(jnp.float32), -1)  # [T,B]
    recall = jnp.mean((d2[None] < th).astype(jnp.float32), -1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    return {"precision": precision, "recall": recall, "f1": f1}


def iou_volumes(occ1: jnp.ndarray, occ2: jnp.ndarray) -> jnp.ndarray:
    """|A ∩ B| / |A ∪ B| over boolean occupancy grids [..,D,D,D]."""
    a = occ1.astype(bool)
    b = occ2.astype(bool)
    inter = jnp.sum((a & b).reshape(*a.shape[:-3], -1), -1)
    union = jnp.sum((a | b).reshape(*a.shape[:-3], -1), -1)
    return inter / jnp.maximum(union, 1)


def sample_mesh_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                        rng: np.random.RandomState | None = None
                        ) -> np.ndarray:
    """Area-weighted uniform surface sampling [n,3].

    The reference samples 2048 mesh VERTICES when enough exist
    (test_cd_emd.py:239-288); surface sampling is strictly more uniform —
    we expose both, this is the default for new evaluations."""
    from disn_tpu.core.meshes import sample_surface
    return sample_surface(verts, faces, n, rng)


def sample_mesh_vertices(verts: np.ndarray, n: int,
                         rng: np.random.RandomState | None = None
                         ) -> np.ndarray:
    """Reference protocol: choose n vertices without replacement when
    possible (test_cd_emd.py:248-266)."""
    rng = rng or np.random.RandomState(0)
    if len(verts) >= n:
        idx = rng.choice(len(verts), size=n, replace=False)
    else:
        idx = rng.randint(len(verts), size=n)
    return verts[idx].astype(np.float32)
