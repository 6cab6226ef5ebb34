"""Dense-grid inference tests: block streaming equals direct forward, sharded
equals single-device, and end-to-end volume -> mesh on the synthetic fixture."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disn_tpu.config import Config, Variant
from disn_tpu.core import grids
from disn_tpu.infer import dense
from disn_tpu.models import disn
from disn_tpu.ops import marching
from disn_tpu.parallel import make_mesh


def tiny_cfg(**kw):
    base = dict(num_classes=32, width_mult=0.125, sdf_res=8)
    base.update(kw)
    return Config(**base)


TRANS = np.vstack([np.eye(3) * 60, [68.0, 68.0, 2.0]]).astype(np.float32)
SDF_PARAMS = np.array([-1, -1, -1, 1, 1, 1], np.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = disn.init(cfg, jax.random.PRNGKey(0))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                        (1, 137, 137, 3)), np.float32)
    return cfg, params, img


def _direct(cfg, params, img, pts):
    batch = {
        "img": jnp.asarray(img),
        "sample_pc": jnp.asarray(pts[None]),
        "trans_mat": jnp.asarray(TRANS[None]),
    }
    eps = disn.apply(params, batch, cfg)
    return np.asarray(dense.scale_pred(eps["pred_sdf"], cfg))[0]


def test_dense_matches_direct_forward(setup):
    cfg, params, img = setup
    vol = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128)
    R = cfg.grid_resolution
    assert vol.shape == (R, R, R)
    pts = grids.dense_grid_np(SDF_PARAMS, R)
    want = _direct(cfg, params, img, pts).reshape(R, R, R)
    np.testing.assert_allclose(vol, want, rtol=1e-4, atol=1e-5)


def test_dense_sharded_matches_single(setup):
    cfg, params, img = setup
    mesh = make_mesh(data=1, points=len(jax.devices()))
    single = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128)
    sharded = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128,
                              mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_dense_sharded_2d_mesh_matches_single(setup):
    """An eval-farm (data, points) 2D mesh: dense inference uses EVERY device
    as a slab worker instead of refusing mixed meshes."""
    cfg, params, img = setup
    n = len(jax.devices())
    if n % 2:
        pytest.skip("needs an even device count")
    mesh = make_mesh(data=2, points=n // 2)
    single = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128)
    sharded = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128,
                              mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_dense_binary_variant(setup):
    cfg = tiny_cfg(binary=True)
    params = disn.init(cfg, jax.random.PRNGKey(2))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                        (1, 137, 137, 3)), np.float32)
    vol = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128)
    assert np.abs(vol).max() <= 0.05 + 1e-6  # (softmax-0.5)/10 in [-.05,.05]


def test_dense_global_variant():
    cfg = tiny_cfg(variant=Variant.GLOBAL)
    params = disn.init(cfg, jax.random.PRNGKey(4))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(5),
                                        (1, 137, 137, 3)), np.float32)
    vol = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=128)
    R = cfg.grid_resolution
    pts = grids.dense_grid_np(SDF_PARAMS, R)
    want = _direct(cfg, params, img, pts).reshape(R, R, R)
    np.testing.assert_allclose(vol, want, rtol=1e-4, atol=1e-5)


def test_volume_to_mesh_roundtrip(setup):
    """Untrained net gives noise; mesh extraction must still be robust —
    and a synthetic GT volume must reconstruct the sphere."""
    from disn_tpu.data import synthetic
    R = 33
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32)
    verts, faces = marching.extract_mesh(vol, SDF_PARAMS)
    assert np.abs(np.linalg.norm(verts, axis=1) - 0.6).max() < 2 / 32


def test_sparse_matches_dense_near_surface(setup):
    """Sparse two-level inference must agree with exact dense values inside
    the active band (and in sign everywhere) so extracted meshes match."""
    from disn_tpu.infer import sparse
    cfg, params, img = setup
    cfg = cfg.replace(sdf_res=16)
    exact = dense.dense_sdf(params, img, TRANS, SDF_PARAMS, cfg, block=512)
    vol = sparse.sparse_dense_sdf(params, img, TRANS, SDF_PARAMS, cfg,
                                  stride=4, block=512)
    assert vol.shape == exact.shape
    # within the band around the iso-surface the values are the exact ones
    band = np.abs(exact) < 0.5 * sparse_band(cfg)
    np.testing.assert_allclose(vol[band], exact[band], rtol=1e-4, atol=1e-5)


def sparse_band(cfg):
    span = SDF_PARAMS[3:6] - SDF_PARAMS[0:3]
    rc = cfg.sdf_res // 4 + 1
    return 1.5 * float(np.linalg.norm(span / (rc - 1)))


def test_sparse_analytic_sphere_mesh():
    """End to end: a perfect-SDF 'network' (analytic sphere via the volume
    fill path) -> sparse volume -> mesh must equal the dense-volume mesh."""
    from disn_tpu.data import synthetic
    from disn_tpu.infer import sparse as sparse_mod

    R = 33
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    exact = synthetic.sdf_sphere(np.stack([xx, yy, zz], -1)).astype(np.float32)

    # drive the band/upsample machinery directly on the analytic volume:
    import jax.numpy as jnp
    coarse = exact[::4, ::4, ::4]
    up = np.asarray(sparse_mod._upsample_aligned(jnp.asarray(coarse), 4))
    assert up.shape == exact.shape
    # aligned: coarse points exact
    np.testing.assert_allclose(up[::4, ::4, ::4], coarse, atol=1e-6)
    # sphere SDF is 1-Lipschitz so interpolation error < cell diag
    assert np.abs(up - exact).max() < np.linalg.norm([2 / 8] * 3)

    ids, count = sparse_mod._active_cells(
        jnp.asarray(coarse), jnp.float32(1.5 * np.linalg.norm([2 / 8] * 3)),
        max_cells=512)
    count = int(count)
    assert 0 < count <= 512
    # every sign-change cell of the coarse grid is in the active list
    c = coarse.shape[0] - 1
    corners = np.stack([coarse[dz:dz + c, dy:dy + c, dx:dx + c]
                        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)])
    sign_change = (corners < 0).any(0) & (corners >= 0).any(0)
    want = set(np.nonzero(sign_change.reshape(-1))[0].tolist())
    got = set(np.asarray(ids[:count]).tolist())
    assert want <= got


def test_folded_matches_unfolded(setup):
    """Folding the local-stream weight into the maps is mathematically exact
    (sampling is linear); f32 compute must agree tightly."""
    cfg, params, img = setup
    fn_fold = dense.make_dense_sdf_fn(cfg, block=128, fold_local=True)
    fn_raw = dense.make_dense_sdf_fn(cfg, block=128, fold_local=False)
    import jax.numpy as jnp
    args = (params, jnp.asarray(img), jnp.asarray(TRANS),
            jnp.asarray(SDF_PARAMS))
    np.testing.assert_allclose(np.asarray(fn_fold(*args)),
                               np.asarray(fn_raw(*args)),
                               rtol=1e-4, atol=1e-5)


def test_fold137_matches_unfolded(setup):
    """Merging the five resized folded maps into ONE 137-space map (see
    dense.normalize_fold) is exact up to float summation order: the volume
    must match the unfolded tf1 decode tightly in f32."""
    cfg, params, img = setup
    assert cfg.sampling == "tf1"
    assert dense.normalize_fold(None, cfg) == "137"
    fn_fold = dense.make_dense_sdf_fn(cfg, block=128, fold_local="137")
    fn_raw = dense.make_dense_sdf_fn(cfg, block=128, fold_local="none")
    args = (params, jnp.asarray(img), jnp.asarray(TRANS),
            jnp.asarray(SDF_PARAMS))
    np.testing.assert_allclose(np.asarray(fn_fold(*args)),
                               np.asarray(fn_raw(*args)),
                               rtol=1e-4, atol=1e-5)


def test_fold137_binary_variant():
    """fold137 is head-agnostic: the binary twin decodes identically."""
    cfg = tiny_cfg(binary=True)
    params = disn.init(cfg, jax.random.PRNGKey(2))
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                        (1, 137, 137, 3)), np.float32)
    fn_fold = dense.make_dense_sdf_fn(cfg, block=128, fold_local="137")
    fn_raw = dense.make_dense_sdf_fn(cfg, block=128, fold_local="none")
    args = (params, jnp.asarray(img), jnp.asarray(TRANS),
            jnp.asarray(SDF_PARAMS))
    np.testing.assert_allclose(np.asarray(fn_fold(*args)),
                               np.asarray(fn_raw(*args)),
                               rtol=1e-4, atol=1e-5)


def test_sparse_dynamic_matches_static(setup):
    from disn_tpu.infer import sparse
    cfg, params, img = setup
    cfg = cfg.replace(sdf_res=16)
    a = sparse.sparse_dense_sdf(params, img, TRANS, SDF_PARAMS, cfg,
                                stride=4, block=512, dynamic=False)
    b = sparse.sparse_dense_sdf(params, img, TRANS, SDF_PARAMS, cfg,
                                stride=4, block=512, dynamic=True)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_mesh_cap_overflow_retry():
    """A high-genus (noise) volume overflows the surface heuristic cap;
    volume_to_mesh must retry at the configured ceiling and succeed."""
    from disn_tpu.infer import pipeline as ip
    from disn_tpu.ops import marching
    rng = np.random.RandomState(0)
    R = 33
    vol = rng.randn(R, R, R).astype(np.float32)  # ~half the cells active
    with pytest.raises(ValueError):
        marching.extract_mesh_device(vol, SDF_PARAMS)  # heuristic cap
    verts, faces = ip.volume_to_mesh(vol, SDF_PARAMS,
                                     max_tris=12 * (R - 1) ** 3)
    assert len(faces) > 0


def test_sparse_sharded_matches_single(setup):
    """Points-striped sparse inference over the virtual mesh == single-device
    sparse (the production multi-chip path)."""
    from disn_tpu.infer import sparse
    from disn_tpu.parallel import make_mesh
    cfg, params, img = setup
    cfg = cfg.replace(sdf_res=16)
    single = sparse.sparse_dense_sdf(params, img, TRANS, SDF_PARAMS, cfg,
                                     stride=4, block=512)
    mesh = make_mesh(data=1, points=len(jax.devices()))
    fn, cap = sparse.make_sharded_sparse_fn(cfg, mesh, stride=4, block=512)
    import jax.numpy as jnp
    dev_params = jax.device_put(
        params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
    vol, count, esc = fn(dev_params, jnp.asarray(img), jnp.asarray(TRANS),
                         jnp.asarray(SDF_PARAMS))
    assert int(count) <= cap and int(esc) == 0
    np.testing.assert_allclose(np.asarray(vol), single, rtol=1e-4, atol=1e-5)


def test_image_to_mesh_sharded_matches_single():
    """Multi-chip single-image pipeline (striped sparse + striped records)
    produces the same welded mesh as the single-device production path."""
    import jax
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline
    from disn_tpu.parallel import make_mesh

    cfg = synthetic.tiny_config(sdf_res=32, num_classes=32, width_mult=0.125,
                                compute_dtype="float32", cell_cap_frac=0.9)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    mesh = make_mesh(data=1, points=len(jax.devices()))
    sv, sf = pipeline.image_to_mesh_sharded(params, img, trans, cfg, mesh,
                                            sdf_params=sdfp)
    wv, wf = pipeline.image_to_mesh(params, img, trans, cfg, sdf_params=sdfp)
    np.testing.assert_array_equal(sf, wf)
    np.testing.assert_allclose(sv, wv, atol=2e-5)


def test_analytic_octahedron_params():
    """The hand-crafted param tree decodes exactly |x|+|y|+|z| - r through
    the full production graph (bench.py's workload), and the sparse path
    engages (distance-like field: no cap overflow, no dense fallback)."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline, sparse as sparse_mod

    # cell_cap_frac: band_autocal widens tau by the field's true sqrt(3)
    # slope, and at a 8^3 coarse grid that band covers most cells — a
    # tiny-grid artifact (at the production 64^3 it is a thin shell)
    cfg = synthetic.tiny_config(sdf_res=32, num_classes=32, width_mult=0.125,
                                compute_dtype="float32", cell_cap_frac=0.9)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    vol = np.asarray(pipeline.predict_volume(params, img, trans, sdfp, cfg,
                                             sparse=False))
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    Z, Y, X = np.meshgrid(lin, lin, lin, indexing="ij")
    ref = np.abs(X) + np.abs(Y) + np.abs(Z) - 0.6
    assert np.abs(vol - ref).max() < 1e-5
    fn, cap = sparse_mod.make_sparse_dense_sdf_fn(
        cfg, cell_cap_frac=cfg.cell_cap_frac)
    import jax.numpy as jnp
    _, count, esc = fn(params, jnp.asarray(img), jnp.asarray(trans),
                       jnp.asarray(sdfp))
    assert int(count) <= cap and int(esc) == 0


def test_steep_field_autocal():
    """Round-2 verdict weak #2: a head that OVER-reports |sdf| (gain 5, a
    small L1 ball floated off-grid inside one coarse cell so no corner
    sign flips) is silently culled by the plain Lipschitz-1 band — and the
    band_autocal slope estimate (max near-band directional |dv|/h over
    axes + space diagonals) rescues it.

    Geometry: sdf_res=64, stride 4 -> coarse rc=17, h=0.125. The ball
    (r=0.06) centers on a coarse CELL center (h/2 offsets): nearest coarse
    corner L1 distance 0.1875 > r, so corner signs agree; corner |v| =
    gain*(0.1875-0.06) = 0.64 > tau0 = 1.5*h*sqrt(3) = 0.325 -> plain band
    culls the only surface-bearing cells. Autocal measures slope ~gain on
    the near-band edges, widens tau past 0.64, and the mesh reappears,
    matching the exact dense-path mesh."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    cfg = synthetic.tiny_config(sdf_res=64, num_classes=32, width_mult=0.125,
                                compute_dtype="float32")
    params = synthetic.analytic_octahedron_params(
        cfg, r=0.06, gain=5.0, center=(0.0625, 0.0625, 0.0625))
    img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    # without autocal the production fast path returns an EMPTY mesh with
    # no fallback flag — the silent-loss failure mode this guards against
    off = pipeline._sparse_fused_mesh(params, img, trans, sdfp,
                                      cfg.replace(band_autocal=False),
                                      iso=0.0)
    assert off is not None and len(off[1]) == 0

    # with autocal (default) the fused mesh equals the exact dense-path one
    on = pipeline._sparse_fused_mesh(params, img, trans, sdfp, cfg, iso=0.0)
    assert on is not None and len(on[1]) > 0
    vol_d = np.asarray(pipeline.predict_volume(params, img, trans, sdfp,
                                               cfg, sparse=False))
    want = pipeline.volume_to_mesh(vol_d, sdfp, iso=0.0)
    np.testing.assert_array_equal(on[1], want[1])
    np.testing.assert_allclose(on[0], want[0], atol=2e-5)

    # extreme gain: surface-adjacent corner |v| exceeds even the 4*tau
    # near-band window — the dip-relative widening (win = 4 tau + 2 min|v|)
    # must keep the slope estimate informed (round-3 review finding)
    params11 = synthetic.analytic_octahedron_params(
        cfg, r=0.06, gain=11.0, center=(0.0625, 0.0625, 0.0625))
    on11 = pipeline._sparse_fused_mesh(params11, img, trans, sdfp, cfg,
                                       iso=0.0)
    vol11 = np.asarray(pipeline.predict_volume(params11, img, trans, sdfp,
                                               cfg, sparse=False))
    want11 = pipeline.volume_to_mesh(vol11, sdfp, iso=0.0)
    assert len(want11[1]) > 0
    assert on11 is not None
    np.testing.assert_array_equal(on11[1], want11[1])


def test_spec_cache_hysteresis():
    """Bucket predictions ratchet UP immediately (an under-prediction
    costs a stage re-run + round trip) and shrink only after
    _SHRINK_STREAK consecutive smaller images (over-prediction only pads
    slots) — so farms alternating between object sizes don't thrash."""
    from disn_tpu.infer import pipeline

    key = object()
    pipeline._SPEC_CACHE.pop(key, None)
    pipeline._update_pred(key, 8, 4, 100)
    assert pipeline._SPEC_CACHE[key] == (8, 4, 100, 0, None)
    # bigger image: ratchet up instantly
    pipeline._update_pred(key, 16, 8, 200)
    assert pipeline._SPEC_CACHE[key] == (16, 8, 200, 0, None)
    # smaller images: hold the larger prediction, count the streak
    for i in range(pipeline._SHRINK_STREAK - 1):
        pipeline._update_pred(key, 8, 4, 100)
        assert pipeline._SPEC_CACHE[key] == (16, 8, 200, i + 1, None)
    # streak reached: shrink to the exact need
    pipeline._update_pred(key, 8, 4, 100)
    assert pipeline._SPEC_CACHE[key] == (8, 4, 100, 0, None)
    # per-chunk nv predictions ratchet elementwise at matching bounds and
    # reset on a bounds change (chunk counts at other bounds are garbage)
    b4 = ((0, 1), (1, 1), (2, 1), (3, 1))
    pipeline._update_pred(key, 8, 4, 100, (4, 1024, b4, (10, 40, 30, 5)))
    assert pipeline._SPEC_CACHE[key][4] == (4, 1024, b4, (10, 40, 30, 5))
    pipeline._update_pred(key, 8, 4, 100, (4, 1024, b4, (20, 15, 35, 6)))
    assert pipeline._SPEC_CACHE[key][4] == (4, 1024, b4, (20, 40, 35, 6))
    assert pipeline._SPEC_CACHE[key][3] == 1  # held-up counts = a streak
    # a chunk-bounds change (e.g. the _CHUNK_DESC knob) resets the counts
    b4b = ((0, 2), (2, 1), (3, 1))
    pipeline._update_pred(key, 8, 4, 100, (4, 1024, b4b, (1, 2, 3)))
    assert pipeline._SPEC_CACHE[key][4] == (4, 1024, b4b, (1, 2, 3))
    pipeline._update_pred(key, 8, 4, 100, (8, 1024, b4, (1, 2, 3, 4)))
    assert pipeline._SPEC_CACHE[key][4] == (8, 1024, b4, (1, 2, 3, 4))
    # an uncovered image (nv unknown) downgrades the nv prediction so the
    # next image re-learns it on the masked stream
    pipeline._update_pred(key, 8, 4, None)
    assert pipeline._SPEC_CACHE[key][2] is None
    assert pipeline._SPEC_CACHE[key][4] is None
    pipeline._SPEC_CACHE.pop(key, None)


def test_speculative_ladder_reaches_compact_mode():
    """Consecutive same-config images climb the speculation ladder:
    image 1 seeds the bucket cache (sequential), image 2 runs the masked
    predicted path and learns nv + the per-chunk crossing counts, image 3+
    runs the CHUNKED COMPACT path (crossing-only tq, slot-range chunks
    whose fetches overlap later chunks' compute). Every rung must produce
    the identical welded mesh."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    cfg = synthetic.tiny_config(sdf_res=64, num_classes=32, width_mult=0.125,
                                compute_dtype="float32")
    # wide autocal band at a small coarse grid: raise the cap so the
    # sparse fast path engages instead of falling back; compact_tq pinned
    # explicitly (it is also the default since the round-4 TPU A/B)
    cfg = cfg.replace(cell_cap_frac=0.9, compact_tq=True)
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    rng = np.random.RandomState(0)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    pipeline._SPEC_CACHE.clear()

    meshes = []
    modes = []
    for i in range(4):
        img = rng.rand(1, 137, 137, 3).astype(np.float32)
        # optimistic=True (the default, pinned here explicitly): this test
        # asserts the speculative-assembly accept path specifically
        ctx = pipeline._fused_dispatch(params, img, trans, sdfp, cfg,
                                       iso=cfg.iso, optimistic=True)
        modes.append(ctx.get("mode"))
        out = pipeline._fused_collect(ctx)
        assert out is not None
        meshes.append(out)
    assert modes[0] is None          # sequential seed
    assert modes[1] == "masked"      # bucket prediction, nv unknown
    assert modes[2] == "cchunk"      # chunk nvs predicted: chunked compact
    assert modes[3] == "cchunk"
    for v, f in meshes[1:]:
        np.testing.assert_array_equal(f, meshes[0][1])
        np.testing.assert_allclose(v, meshes[0][0], atol=2e-5)


def test_speculative_mispredictions_stay_exact():
    """Alternating object sizes under ONE cache key (the farm case):
    whatever the prediction state — seed, under-predicted buckets forcing
    stage re-runs, ratcheted-up over-predictions — every image's mesh must
    equal the mesh produced with a fresh cache."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    cfg = synthetic.tiny_config(sdf_res=64, num_classes=32, width_mult=0.125,
                                compute_dtype="float32")
    cfg = cfg.replace(cell_cap_frac=0.9)
    p_small = synthetic.analytic_octahedron_params(cfg, r=0.45)
    p_big = synthetic.analytic_octahedron_params(cfg, r=0.95)
    rng = np.random.RandomState(1)
    trans = synthetic.demo_trans_mat()

    # fresh-cache references
    refs = {}
    for tag, p in (("small", p_small), ("big", p_big)):
        pipeline._SPEC_CACHE.clear()
        img = rng.rand(1, 137, 137, 3).astype(np.float32)
        refs[tag] = pipeline.image_to_mesh(p, img, trans, cfg)
        # the reference must not depend on the image (features don't feed
        # the analytic decoder), so reuse across iterations is sound
    pipeline._SPEC_CACHE.clear()
    seq = ["small", "big", "small", "small", "big", "big", "small"]
    for tag in seq:
        img = rng.rand(1, 137, 137, 3).astype(np.float32)
        p = p_small if tag == "small" else p_big
        verts, faces = pipeline.image_to_mesh(p, img, trans, cfg)
        rv, rf = refs[tag]
        np.testing.assert_array_equal(faces, rf)
        np.testing.assert_allclose(verts, rv, atol=2e-5)


def test_image_to_mesh_fused_matches_unfused():
    """The fused production driver (scan inside phase_b, extraction from the
    precomputed cell list) produces the SAME welded mesh as the two-step
    volume -> extract path, on regress and binary variants."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline

    for binary in (False, True):
        cfg = synthetic.tiny_config(sdf_res=32, num_classes=32,
                                    width_mult=0.125,
                                    compute_dtype="float32", binary=binary)
        # at 8^3 coarse cells the binary sign-dilation marks >25% of cells;
        # raise the cap so the sparse path engages instead of falling back
        # (binary_sparse: the heuristic binary cull is opt-in)
        cfg = cfg.replace(cell_cap_frac=0.9, binary_sparse=True)
        params = synthetic.analytic_octahedron_params(cfg, r=0.6)
        img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
        trans = synthetic.demo_trans_mat()
        sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
        fused = pipeline._sparse_fused_mesh(params, img, trans, sdfp, cfg,
                                            iso=cfg.iso)
        assert fused is not None  # distance-like field: no fallback fired
        vol = pipeline.predict_volume(params, img, trans, sdfp, cfg,
                                      sparse=True)
        want = pipeline.volume_to_mesh(vol, sdfp, iso=cfg.iso)
        np.testing.assert_allclose(fused[0], want[0], atol=2e-5)
        np.testing.assert_array_equal(fused[1], want[1])


def test_boundary_crossing_sparse_mesh_matches_dense():
    """A surface CUT by the volume boundary (octahedron r=1.4 > box): the
    sparse path must decode the boundary planes exactly (the plane-skip
    cond takes the decode branch) and the extracted mesh must equal the
    dense-volume mesh, ghost cells included. r=1.05 keeps the active band
    under the cell cap (1.2+ overflows to the dense fallback — also fine,
    but then this test would not exercise the sparse boundary path)."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline
    from disn_tpu.ops import marching

    cfg = synthetic.tiny_config(sdf_res=32, num_classes=32, width_mult=0.125,
                                compute_dtype="float32")
    # boundary band is wide at 8^3 (wider still under band_autocal's
    # sqrt(3) L1-slope correction): cap at the full cell count so the
    # sparse boundary path engages instead of falling back
    cfg = cfg.replace(cell_cap_frac=1.0)
    params = synthetic.analytic_octahedron_params(cfg, r=1.05)
    img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    vol_d = np.asarray(pipeline.predict_volume(params, img, trans, sdfp, cfg,
                                               sparse=False))
    dv, df = marching.extract_mesh_owned(vol_d, sdfp)
    assert len(df) > 0
    fused = pipeline._sparse_fused_mesh(params, img, trans, sdfp, cfg,
                                        iso=cfg.iso)
    assert fused is not None
    np.testing.assert_array_equal(fused[1], df)
    np.testing.assert_allclose(fused[0], dv, atol=2e-5)


def test_binary_sparse_matches_dense():
    """Binary variant through the sign-change-dilation sparse path: same
    extracted surface as the dense path (the far field differs by
    interpolation but never in sign)."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline
    from disn_tpu.ops import marching

    cfg = synthetic.tiny_config(sdf_res=32, num_classes=32, width_mult=0.125,
                                compute_dtype="float32", binary=True)
    cfg = cfg.replace(binary_sparse=True)  # heuristic cull is OPT-IN
    params = synthetic.analytic_octahedron_params(cfg, r=0.6)
    img = np.random.RandomState(0).rand(1, 137, 137, 3).astype(np.float32)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    vol_d = np.asarray(pipeline.predict_volume(params, img, trans, sdfp, cfg,
                                               sparse=False))
    vol_s = np.asarray(pipeline.predict_volume(params, img, trans, sdfp, cfg,
                                               sparse=True))
    assert np.array_equal(np.sign(vol_d), np.sign(vol_s))
    vd, fd = marching.extract_mesh_owned(vol_d, sdfp)
    vs, fs = marching.extract_mesh_owned(vol_s, sdfp)
    assert len(vd) == len(vs) and len(fd) == len(fs)
    np.testing.assert_allclose(np.sort(vs, axis=0), np.sort(vd, axis=0),
                               atol=1e-5)


def test_sparse_words_exact_twin():
    """The sparse-words flow (records + change-bit scan straight from the
    fine kernel's per-cell output, no dense volume) must be an EXACT twin
    of the dense flow: identical scan outputs (count, blk stream) and
    byte-identical record streams on every real slot, hence identical
    meshes through the full speculative ladder. r=0.35 keeps the active
    band off the volume boundary so the guard stays quiet and the sparse
    flow actually runs: at sdf_res=64 the autocal band is ~0.56 world, so
    active corners reach r+0.56 — r=0.25 keeps that under the last cell
    row at 0.875 (the r=0.6 ladder fixture touches the boundary and
    legitimately falls back)."""
    import numpy as np
    from disn_tpu.data import synthetic
    from disn_tpu.infer import pipeline
    from disn_tpu.infer import sparse as sparse_mod
    from disn_tpu.ops import marching as m

    cfg_s = synthetic.tiny_config(sdf_res=64, num_classes=32,
                                  width_mult=0.125,
                                  compute_dtype="float32")
    cfg_s = cfg_s.replace(cell_cap_frac=0.9, sparse_words=True)
    cfg_d = cfg_s.replace(sparse_words=False)
    params = synthetic.analytic_octahedron_params(cfg_s, r=0.25)
    rng = np.random.RandomState(3)
    trans = synthetic.demo_trans_mat()
    sdfp = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    # --- unit twin: same phase_a outputs through both pbm jits ---
    img = rng.rand(1, 137, 137, 3).astype(np.float32)
    block = 32768
    sizes, _, _ = sparse_mod._sparse_parts(cfg_s, 4, block, 0.9, 1.5)
    pa = sparse_mod._phase_a_jit(cfg_s, 4, block, 0.9, 1.5)
    pa_out = pa(params, jnp.asarray(img), jnp.asarray(trans),
                jnp.asarray(sdfp))
    emb, eps, vol_c, cell_ids, count, esc_a = pa_out
    nb = pipeline._needed_blocks(int(count), sizes)
    bcap = pipeline._fused_bcap(nb, sizes)
    dn = sparse_mod._phase_b_mesh_jit(cfg_s, 4, block, 0.9, 1.5, nb,
                                      0.0, bcap)
    sp = sparse_mod._phase_b_mesh_sparse_jit(cfg_s, 4, block, 0.9, 1.5, nb,
                                             0.0, bcap)
    vol, eb_d, ids_d, nc_d, gov_d, blk_d = dn(params, emb, eps, vol_c,
                                              cell_ids, count,
                                              jnp.asarray(trans),
                                              jnp.asarray(sdfp))
    words, eb_s, ids_s, nc_s, gov_s, blk_s = sp(params, emb, eps, vol_c,
                                                cell_ids, count,
                                                jnp.asarray(trans),
                                                jnp.asarray(sdfp))
    assert int(gov_d) == 0 and int(gov_s) == 0
    nc = int(nc_d)
    assert nc == int(nc_s) and nc > 0
    np.testing.assert_array_equal(np.asarray(blk_s), np.asarray(blk_d))
    n_iter, batch = m.records_n_iter(int(ids_d.shape[0]), nc, 8192)
    rec_d, d0, d1, d2, fl_d = m._records_masked_split(
        vol, ids_d, nc_d, iso=0.0, n_iter=n_iter, batch=batch)
    rec_s, s0, s1, s2, fl_s = m._records_masked_split_sparse(
        words, ids_s, nc_s, R=cfg_s.grid_resolution, n_iter=n_iter,
        batch=batch)
    assert int(fl_d[0]) == int(fl_s[0])  # nv
    np.testing.assert_array_equal(np.asarray(rec_s)[:nc],
                                  np.asarray(rec_d)[:nc])
    tq_d = np.concatenate([np.asarray(x).reshape(-1, 7)
                           for x in (d0, d1, d2)])[:nc]
    tq_s = np.concatenate([np.asarray(x).reshape(-1, 7)
                           for x in (s0, s1, s2)])[:nc]
    np.testing.assert_array_equal(tq_s, tq_d)

    # --- integration twin: full speculative ladder, both flows ---
    def ladder(cfg):
        pipeline._SPEC_CACHE.clear()
        pipeline._SWORDS_SKIP.clear()
        out = []
        r2 = np.random.RandomState(7)
        for i in range(4):
            im = r2.rand(1, 137, 137, 3).astype(np.float32)
            out.append(pipeline.image_to_mesh(params, im, trans, cfg))
        return out

    ms = ladder(cfg_s)
    key = (cfg_s, float(cfg_s.iso), block)
    assert key not in pipeline._SWORDS_SKIP  # sparse flow really ran
    md = ladder(cfg_d)
    for (vs, fs), (vd, fd) in zip(ms, md):
        np.testing.assert_array_equal(fs, fd)
        np.testing.assert_array_equal(vs, vd)
