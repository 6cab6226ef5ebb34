"""Fused Pallas decode kernel (ops/pallas_fused + infer/fused): numpy-level
exactness vs the XLA fold137 decode, escape-rescue correctness, and the
integrated sparse path. Runs in interpreter mode on the CPU mesh."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.config import Config
from disn_tpu.infer import dense, fused
from disn_tpu.models import disn

TRANS = np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]]).astype(np.float32)
GEOM = np.array([-1, -1, -1, 1, 1, 1], np.float32)
FINE_R = 49  # smallest kernel-enabled resolution
COARSE_C = 12


@pytest.fixture(scope="module")
def setup():
    cfg = Config(num_classes=32, width_mult=0.125, sdf_res=FINE_R - 1,
                 compute_dtype="float32", sampling="tf1")
    params = disn.init(cfg, jax.random.PRNGKey(0))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                        (1, 137, 137, 3)), np.float32)
    prep = jax.jit(functools.partial(dense._prep, cfg=cfg,
                                     fold_local="137"))
    emb, eps = prep(params, jnp.asarray(img))
    return cfg, params, eps


def _oracle(cfg, params, eps, cells):
    pts, _ = fused._cell_points(jnp.asarray(cells), COARSE_C, FINE_R,
                                jnp.asarray(GEOM))
    return np.asarray(dense._decode_block(params, eps, None,
                                          jnp.asarray(TRANS), pts, cfg,
                                          folded="137"))


def test_decode_cells_exact_including_escapes(setup):
    """decode_cells == XLA fold137 decode for EVERY cell: in-tile cells via
    the kernel, escaped cells (this camera's w=0 plane crosses the box)
    via the in-jit rescue branch."""
    cfg, params, eps = setup
    rng = np.random.RandomState(0)
    cells = np.sort(rng.choice(COARSE_C ** 3, 96, replace=False)
                    ).astype(np.int32)
    vals, esc_over = fused.decode_cells(
        params, eps, jnp.asarray(TRANS), jnp.asarray(GEOM),
        jnp.asarray(cells), cfg, fine_r=FINE_R, coarse_c=COARSE_C)
    assert int(esc_over) == 0
    want = _oracle(cfg, params, eps, cells)
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-5, atol=1e-6)


def test_decode_cells_esc_cap_overflow_reported(setup):
    """More escapes than the cap must be REPORTED, not silently junked."""
    cfg, params, eps = setup
    # cells straddling the w=0 flip plane (z = -1/30 -> z-slab around 23)
    z = COARSE_C // 2 - 1
    cells = np.arange(z * COARSE_C ** 2, (z + 1) * COARSE_C ** 2,
                      dtype=np.int32)
    vals, esc_over = fused.decode_cells(
        params, eps, jnp.asarray(TRANS), jnp.asarray(GEOM),
        jnp.asarray(cells), cfg, fine_r=FINE_R, coarse_c=COARSE_C,
        esc_cap=8)
    # either everything fit/rescued (esc_over 0 and exact) or it's reported
    if int(esc_over) == 0:
        want = _oracle(cfg, params, eps, cells)
        np.testing.assert_allclose(np.asarray(vals), want,
                                   rtol=1e-5, atol=1e-6)


def test_dense_grid_via_cells_matches_stream(setup):
    """Full-grid kernel decode (cells + boundary planes) == the block-
    streamed XLA volume, on a thin z-slab worth of cells via the dense fn."""
    cfg, params, eps = setup
    # subset: first 2 z-slabs of cells + oracle over those exact points
    cells = np.arange(2 * COARSE_C ** 2, dtype=np.int32)
    vals, esc_over = fused.decode_cells(
        params, eps, jnp.asarray(TRANS), jnp.asarray(GEOM),
        jnp.asarray(cells), cfg, fine_r=FINE_R, coarse_c=COARSE_C)
    assert int(esc_over) == 0
    want = _oracle(cfg, params, eps, cells)
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-5, atol=1e-6)


def test_sparse_kernel_path_matches_xla_path():
    """The integrated sparse fn with the kernel ON == kernel OFF (both exact
    two-level sparse volumes) on a kernel-enabled resolution."""
    from disn_tpu.infer import sparse
    cfg_on = Config(num_classes=32, width_mult=0.125, sdf_res=FINE_R - 1,
                    compute_dtype="float32", sampling="tf1",
                    fused_kernel="on")
    cfg_off = cfg_on.replace(fused_kernel="off")
    params = disn.init(cfg_on, jax.random.PRNGKey(2))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                        (1, 137, 137, 3)), np.float32)
    a = sparse.sparse_dense_sdf(params, img, TRANS, GEOM, cfg_on,
                                stride=4, block=512)
    b = sparse.sparse_dense_sdf(params, img, TRANS, GEOM, cfg_off,
                                stride=4, block=512)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_decode_cells_bf16_close_to_xla_bf16():
    """In bf16 (the production dtype) the kernel and the XLA path round
    independently (bilinear weights and activations quantize to 8 mantissa
    bits on both sides, in different orders): values must agree within a
    small tolerance — the f32 tests pin exactness, this pins the bf16
    drift stays bounded."""
    cfg = Config(num_classes=32, width_mult=0.125, sdf_res=FINE_R - 1,
                 compute_dtype="bfloat16", sampling="tf1")
    params = disn.init(cfg, jax.random.PRNGKey(0))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                        (1, 137, 137, 3)), np.float32)
    prep = jax.jit(functools.partial(dense._prep, cfg=cfg,
                                     fold_local="137"))
    emb, eps = prep(params, jnp.asarray(img))
    cells = np.arange(0, COARSE_C ** 3, 7, dtype=np.int32)[:256]
    vals, esc = fused.decode_cells(params, eps, jnp.asarray(TRANS),
                                   jnp.asarray(GEOM), jnp.asarray(cells),
                                   cfg, fine_r=FINE_R, coarse_c=COARSE_C)
    want = _oracle(cfg, params, eps, cells)
    got = np.asarray(vals)
    scale = max(1e-3, np.abs(want).max())
    assert np.abs(got - want).max() <= 0.02 * scale
    assert np.abs(got - want).mean() <= 0.003 * scale
