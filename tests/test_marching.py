"""Marching-tetrahedra tests: geometric accuracy, topology (watertight,
Euler characteristic), orientation (signed volume), device-vs-numpy oracle."""
import numpy as np
import pytest

from disn_tpu.data import synthetic
from disn_tpu.ops import marching


def sphere_volume(R=33, r=0.6):
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1)
    return synthetic.sdf_sphere(pts, r=r).astype(np.float32)


PARAMS = np.array([-1, -1, -1, 1, 1, 1], np.float32)


def mesh_stats(verts, faces):
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=1).sum()
    # signed volume via divergence theorem (positive for outward normals)
    vol = np.einsum("ij,ij->i", v0, cross).sum() / 6.0
    return area, vol


def test_sphere_mesh_geometry():
    verts, faces = marching.extract_mesh(sphere_volume(), PARAMS)
    assert len(verts) > 500 and len(faces) > 1000
    radii = np.linalg.norm(verts, axis=1)
    cell = 2.0 / 32
    assert np.abs(radii - 0.6).max() < cell  # vertices on the sphere
    area, vol = mesh_stats(verts, faces)
    assert area == pytest.approx(4 * np.pi * 0.6 ** 2, rel=0.02)
    assert vol == pytest.approx(4 / 3 * np.pi * 0.6 ** 3, rel=0.03)
    assert vol > 0, "normals must point outward"


def test_sphere_mesh_topology():
    verts, faces = marching.extract_mesh(sphere_volume(R=17), PARAMS)
    # watertight: every edge shared by exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "mesh is not watertight"
    # Euler characteristic of a sphere: V - E + F = 2
    V, E, F = len(verts), len(np.unique(edges, axis=0)), len(faces)
    assert V - E + F == 2


def test_device_matches_numpy_oracle():
    vol = sphere_volume(R=9, r=0.55)
    soup_np = marching.marching_tets_np(vol, PARAMS)
    import jax.numpy as jnp
    pos, keys, count = marching.marching_tets_jit(
        jnp.asarray(vol), jnp.asarray(PARAMS), max_tris=4096)
    soup_dev = np.asarray(pos[:int(count)])
    assert soup_dev.shape == soup_np.shape
    # same triangles in same (z,y,x cell-scan) order
    np.testing.assert_allclose(soup_dev, soup_np, atol=1e-5)


def test_iso_offset_shifts_radius():
    vol = sphere_volume(R=33, r=0.6)
    verts, _ = marching.extract_mesh(vol, PARAMS, iso=0.1)
    radii = np.linalg.norm(verts, axis=1)
    assert np.abs(radii - 0.7).max() < 2.0 / 32


def test_box_mesh_volume():
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1)
    vol = synthetic.sdf_box(pts, half=0.45).astype(np.float32)
    verts, faces = marching.extract_mesh(vol, PARAMS)
    _, v = mesh_stats(verts, faces)
    assert v == pytest.approx(0.9 ** 3, rel=0.05)


def test_empty_volume():
    vol = np.ones((9, 9, 9), np.float32)  # all outside
    verts, faces = marching.extract_mesh(vol, PARAMS)
    assert len(verts) == 0 and len(faces) == 0


def test_overflow_detection():
    vol = sphere_volume(R=17)
    import jax.numpy as jnp
    _, _, count = marching.marching_tets_jit(
        jnp.asarray(vol), jnp.asarray(PARAMS), max_tris=8)
    assert int(count) > 8  # count keeps increasing; extract_mesh raises
    with pytest.raises(ValueError):
        marching.extract_mesh(vol, PARAMS, max_tris=8)


def test_device_weld_matches_host():
    vol = sphere_volume(R=17)
    host_v, host_f = marching.extract_mesh(vol, PARAMS)
    dev_v, dev_f = marching.extract_mesh_device(vol, PARAMS)
    assert len(dev_v) == len(host_v)
    assert len(dev_f) == len(host_f)
    # same welded topology up to vertex relabeling: compare sorted vertex
    # sets and per-face vertex-position triples. The production path
    # transfers u16 fixed-point vertices: tolerance is the quantizer step.
    step = 2.0 / 65535
    np.testing.assert_allclose(np.sort(dev_v, axis=0),
                               np.sort(host_v, axis=0), atol=step)
    tri_h = np.sort(host_v[host_f].reshape(len(host_f), -1), axis=1)
    tri_d = np.sort(dev_v[dev_f].reshape(len(dev_f), -1), axis=1)
    np.testing.assert_allclose(np.sort(tri_h, axis=0),
                               np.sort(tri_d, axis=0), atol=step)


def test_device_weld_empty():
    vol = np.ones((9, 9, 9), np.float32)
    v, f = marching.extract_mesh_device(vol, PARAMS)
    assert len(v) == 0 and len(f) == 0


def _mesh_sets(v, f):
    tris = np.sort(np.sort(v[f].reshape(len(f), -1), axis=1), axis=0)
    return np.sort(v, axis=0), tris


@pytest.mark.parametrize("case", ["sphere", "boundary", "plane", "random",
                                  "iso"])
def test_owned_matches_sorted_weld(case):
    """The owned-edge extractor (production) against the independent
    marching_tets + sort-weld implementation: identical welded vertex sets
    and triangle sets, including surfaces cut by the volume boundary (ghost
    cells) and the ghost-edge aliasing suppression."""
    iso = 0.0
    if case == "sphere":
        vol = sphere_volume(R=17)
    elif case == "boundary":
        vol = sphere_volume(R=17, r=1.3)  # sphere larger than the box
    elif case == "plane":
        lin = np.linspace(-1, 1, 17, dtype=np.float32)
        zz, _, _ = np.meshgrid(lin, lin, lin, indexing="ij")
        vol = (zz - 0.1).astype(np.float32)
    elif case == "random":
        vol = np.random.RandomState(3).randn(9, 9, 9).astype(np.float32)
    else:
        vol = sphere_volume(R=17)
        iso = 0.07
    hv, hf = marching.extract_mesh_device_sorted(vol, PARAMS, iso=iso)
    ov, of_ = marching.extract_mesh_owned(vol, PARAMS, iso=iso, batch=512)
    assert len(ov) == len(hv) and len(of_) == len(hf)
    hvs, hts = _mesh_sets(hv, hf)
    ovs, ots = _mesh_sets(ov, of_)
    np.testing.assert_allclose(ovs, hvs, atol=1e-6)
    np.testing.assert_allclose(ots, hts, atol=1e-6)
    # welded: no duplicate vertices, no orphans
    assert len(np.unique(ov.round(6), axis=0)) == len(ov)
    if len(of_):
        assert len(np.unique(of_)) == len(ov)


def test_owned_winding_and_watertight():
    vol = sphere_volume(R=33)
    v, f = marching.extract_mesh_owned(vol, PARAMS)
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cr = np.cross(v1 - v0, v2 - v0)
    assert np.einsum("ij,ij->i", v0, cr).sum() / 6 > 0  # outward normals
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]],
                                    f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_owned_group_cap_overflow():
    vol = np.random.RandomState(0).randn(33, 33, 33).astype(np.float32)
    with pytest.raises(ValueError):
        marching.extract_mesh_owned(vol, PARAMS, gcap=128)
    # extract_mesh_device retries through the pipeline ceiling path
    from disn_tpu.infer import pipeline
    v, f = pipeline.volume_to_mesh(vol, PARAMS, max_tris=1 << 21)
    assert len(v) and len(f)


def test_owned_packed_transfer():
    """Quantized one-buffer transfer: identical faces, vertices within the
    u16 fixed-point step of the exact f32 fetch."""
    vol = sphere_volume(R=33)
    ev, ef = marching.extract_mesh_owned(vol, PARAMS)
    pv, pf = marching.extract_mesh_owned(vol, PARAMS, packed=True)
    np.testing.assert_array_equal(pf, ef)
    step = 2.0 / 65535
    assert np.abs(pv - ev).max() <= step
    # face fields exceed no packing width on an asymmetric bbox either
    prm = np.array([-0.3, -1, -2, 0.9, 1, 2], np.float32)
    ev, ef = marching.extract_mesh_owned(vol, prm)
    pv, pf = marching.extract_mesh_owned(vol, prm, packed=True)
    np.testing.assert_array_equal(pf, ef)
    assert np.abs(pv - ev).max() <= 4.0 / 65535


@pytest.mark.parametrize("case", ["sphere", "boundary", "random", "iso"])
def test_records_match_owned(case):
    """Record-mode extraction (device slot records -> host assembly, both
    the numpy oracle and the native C twin) reproduces the device two-pass
    extractor EXACTLY: same faces, vertices within the edge-t quantization
    step (1/65535 of a cell edge)."""
    import jax.numpy as jnp

    iso = 0.0
    if case == "sphere":
        vol = sphere_volume(R=17)
    elif case == "boundary":
        vol = sphere_volume(R=17, r=1.3)
    elif case == "random":
        vol = np.random.RandomState(3).randn(9, 9, 9).astype(np.float32)
    else:
        vol = sphere_volume(R=17)
        iso = 0.07
    ev, ef = marching.extract_mesh_owned(vol, PARAMS, iso=iso, batch=512)

    R = vol.shape[0]
    gcap = marching._norm_gcap(R, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, float(iso), gcap)
    nc = int(ncd)
    assert int(gov) == 0
    n_iter = min(marching._qbucket(max(1, -(-nc // 512))),
                 -(-gcap * 64 // 512))
    rec_d, tq_d = marching._extract_records(vold, ids, ncd, iso=float(iso),
                                            n_iter=n_iter, batch=512)
    ids_np = np.asarray(ids)[:nc]
    recs, tqs = np.asarray(rec_d), np.asarray(tq_d)
    cell = 2.0 / (R - 1)
    for impl in ("numpy", "native"):
        if impl == "numpy":
            av, af = marching.assemble_mesh_np(ids_np, recs, tqs, nc, R,
                                               PARAMS)
        else:
            from disn_tpu import native
            av, af = native.mesh_assemble(ids_np, recs, tqs, nc, R,
                                          np.asarray(PARAMS, np.float32))
        np.testing.assert_array_equal(af, ef), impl
        assert av.shape == ev.shape, impl
        assert np.abs(av - ev).max() <= cell / 65535 + 1e-6, impl


@pytest.mark.parametrize("cores", [1, 4])
def test_masked_records_path_matches_owned(cores, monkeypatch):
    """The masked record path (block-mask stream -> native id expansion ->
    split faces/verts assembly overlapping the tq fetch) reproduces the
    device extractor exactly, like the monolithic assembler — in both the
    single-core (join-all-first) and multi-core (overlapped) schedules."""
    import os as os_mod

    import jax.numpy as jnp
    from disn_tpu.infer import sparse as sparse_mod

    monkeypatch.setattr(os_mod, "cpu_count", lambda: cores)

    vol = sphere_volume(R=33, r=0.6)
    R = vol.shape[0]
    ev, ef = marching.extract_mesh_owned(vol, PARAMS, batch=512)

    stride = 4
    coarse = jnp.asarray(vol[::stride, ::stride, ::stride])
    rc = coarse.shape[0]
    span = PARAMS[3:6] - PARAMS[0:3]
    tau = 1.5 * np.sqrt(np.sum((span / (rc - 1)) ** 2))
    cell_ids, count = sparse_mod._active_cells(coarse, jnp.float32(tau), 512)
    ids, ncd, ov, blk = marching._active_cells_from_coarse(
        jnp.asarray(vol), cell_ids, count, iso=0.0, stride=stride, bcap=768)
    nc = int(ncd)
    assert int(ov) == 0 and nc > 0
    n_iter, batch = marching.records_n_iter(int(ids.shape[0]), nc, 512)
    rec_d, tq_d, _ = marching.records_dispatch(vol=jnp.asarray(vol), ids=ids,
                                               n_cells_d=ncd, iso=0.0,
                                               n_iter=n_iter, batch=batch)
    futs = marching.records_start_fetch_masked(rec_d, tq_d, blk)
    av, af = marching.records_finish_masked(futs, PARAMS, nc, R)()
    np.testing.assert_array_equal(af, ef)
    assert av.shape == ev.shape
    cell = 2.0 / (R - 1)
    assert np.abs(av - ev).max() <= cell / 65535 + 1e-6

    # blocks-driven passes == id-driven oracle passes (identical output)
    try:
        from disn_tpu import native
        blk_np = np.asarray(blk)
        ids_full, n_full = native.mesh_expand_ids(blk_np, R)
        assert n_full == nc
        rec_np = np.asarray(rec_d)
        tq_np = np.asarray(tq_d)
        f_ids = native.mesh_faces(ids_full, rec_np, nc, R)
        f_blk = native.mesh_faces_blocks(blk_np, rec_np, nc, R)
        np.testing.assert_array_equal(f_blk, f_ids)
        v_ids = native.mesh_verts(ids_full, rec_np, tq_np, nc, R, PARAMS)
        v_blk = native.mesh_verts_blocks(blk_np, rec_np, tq_np, nc, R,
                                         PARAMS)
        np.testing.assert_array_equal(v_blk, v_ids)
    except OSError:
        pass  # native build unavailable: the numpy-oracle paths cover it

    # compact-tq variant: vertex-ordered crossing-only t stream
    nv = int(marching._count_cross(rec_d))
    assert nv == len(ev)
    nvcap = marching._qbucket(max(4, int(nv * 1.15)))
    tqc_d, nv_d = marching._compact_tq(rec_d, tq_d, nvcap)
    assert int(nv_d) == nv
    futs = marching.records_start_fetch_compact(rec_d, tqc_d, blk)
    cv, cf = marching.records_finish_compact(futs, PARAMS, nc, nv, R)()
    np.testing.assert_array_equal(cf, ef)
    np.testing.assert_array_equal(cv, av)
    # numpy-oracle compact assembler agrees too
    tqc = np.asarray(tqc_d)
    if tqc.dtype == np.uint8:
        tqc = tqc.astype(np.uint16) * np.uint16(257)
    ov_, of_ = marching.assemble_mesh_np(
        np.asarray(ids)[:nc], np.asarray(rec_d), tqc, nc, R, PARAMS,
        tq_compact=True)
    np.testing.assert_array_equal(of_, ef)
    # oracle interpolates in f32, native in double: one-ulp drift allowed
    np.testing.assert_allclose(ov_, av, atol=2e-7)


def test_records_cchunk_matches_masked():
    """The CHUNKED compact record stage (slot-range chunk jits whose
    fetches overlap later chunks' device compute) reproduces the masked
    path's mesh exactly: concatenated rec chunks == the global rec stream,
    and each chunk's tqc[:nv_k] slices concatenate to the global compact
    tq (vertex order is slot-major). Also checks the per-chunk nv seeds in
    the masked flags vector and the chunked speculative self-checks."""
    import jax.numpy as jnp
    from disn_tpu.infer import sparse as sparse_mod

    vol = sphere_volume(R=33, r=0.6)
    R = vol.shape[0]
    stride = 4
    coarse = jnp.asarray(vol[::stride, ::stride, ::stride])
    rc = coarse.shape[0]
    span = PARAMS[3:6] - PARAMS[0:3]
    tau = 1.5 * np.sqrt(np.sum((span / (rc - 1)) ** 2))
    cell_ids, count = sparse_mod._active_cells(coarse, jnp.float32(tau), 512)
    ids, ncd, ov, blk = marching._active_cells_from_coarse(
        jnp.asarray(vol), cell_ids, count, iso=0.0, stride=stride, bcap=768)
    nc = int(ncd)
    n_iter, batch = marching.records_n_iter(int(ids.shape[0]), nc, 512)

    # masked reference + the per-chunk nv seeds its flags now carry
    rec_d, tq0, tq1, tq2, flags_d = marching._records_masked_split(
        jnp.asarray(vol), ids, ncd, iso=0.0, n_iter=n_iter, batch=batch,
        scalars=(ncd,))
    mfuts = marching.records_start_fetch_masked(
        rec_d, jnp.concatenate([tq0, tq1, tq2]), blk)
    ev, ef = marching.records_finish_masked(mfuts, PARAMS, nc, R)()
    flags = [int(x) for x in np.asarray(flags_d)]
    # the rec stream is u8 (inside mask only) — nv comes from flags; the
    # host-side cross derivation is pinned below via the derived recs
    nv = flags[1]
    bounds = marching._chunk_bounds(n_iter)
    assert flags[0] == nc
    nvk_seed = flags[2:]
    assert len(nvk_seed) == len(bounds) and sum(nvk_seed) == nv

    # chunked compact stage at the seeded per-chunk buckets
    words = marching._dense_words_jit(jnp.asarray(vol), iso=0.0)
    nvcaps = tuple(marching._qbucket(max(4, int(k * 1.25)))
                   for k in nvk_seed)
    parts = [blk]
    nv_ds = []
    for k, (s, sz) in enumerate(bounds):
        rec_k, tqc_k, nv_k = marching._records_chunk_compact(
            words, ids, ncd, R=R, start=s * batch, size=sz * batch,
            nvcap=nvcaps[k])
        parts += [rec_k, tqc_k]
        nv_ds.append(nv_k)
    flags2 = marching._flags_stack([ncd, *nv_ds])
    parts.append(flags2)
    subs = marching.records_submit(parts)
    C = len(bounds)
    futs = ([subs[0]] + [subs[1 + 2 * k] for k in range(C)]
            + [subs[2 + 2 * k] for k in range(C)] + [subs[-1]])
    nvks = [int(x) for x in np.asarray(flags2)][1:]
    assert nvks == nvk_seed
    cv, cf = marching.records_finish_cchunk(futs, PARAMS, nc, nv, R)()
    np.testing.assert_array_equal(cf, ef)
    np.testing.assert_array_equal(cv, ev)

    # concatenated rec chunks == the global slot-dense rec stream
    rec_cat = np.concatenate([f.result() for f in futs[1:1 + C]])
    np.testing.assert_array_equal(rec_cat, np.asarray(rec_d))

    # chunked speculative: happy path, then a chunk-cap overflow bail
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "cchunk", nvcaps)
    verts, faces, n_o, nv_o = fut.result()
    assert (n_o, nv_o) == (nc, nv)
    np.testing.assert_array_equal(faces, ef)
    np.testing.assert_array_equal(verts, ev)
    bad_caps = tuple(max(0, k - 1) for k in nvk_seed)
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "cchunk", bad_caps)
    assert fut.result() is None

    # chunk-INCREMENTAL speculative (lag-1 faces / per-chunk verts via
    # native.BlockAssembler): bit-identical mesh, and the same cap bail
    cslots = [sz * batch for _, sz in bounds]
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "cchunk", nvcaps, chunk_slots=cslots)
    verts, faces, n_o, nv_o = fut.result()
    assert (n_o, nv_o) == (nc, nv)
    np.testing.assert_array_equal(faces, ef)
    np.testing.assert_array_equal(verts, ev)
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "cchunk", bad_caps, chunk_slots=cslots)
    assert fut.result() is None
    # under-coverage bail: chunk slots below the scan's cell count
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "cchunk", nvcaps,
        chunk_slots=[max(0, nc - 8)] + [0] * (len(cslots) - 1))
    assert fut.result() is None


def test_speculative_assembly_self_checks():
    """records_assemble_speculative derives n_cells/nv from the fetched
    buffers, matches the exact finish paths on the happy path, and bails
    (returns None) on slot under-coverage, compact-tq cap overflow, and a
    pre-set cancel event — the branches the production pipeline only hits
    on rare mispredictions."""
    import jax.numpy as jnp
    from disn_tpu.infer import sparse as sparse_mod

    vol = sphere_volume(R=33, r=0.6)
    R = vol.shape[0]
    stride = 4
    coarse = jnp.asarray(vol[::stride, ::stride, ::stride])
    rc = coarse.shape[0]
    span = PARAMS[3:6] - PARAMS[0:3]
    tau = 1.5 * np.sqrt(np.sum((span / (rc - 1)) ** 2))
    cell_ids, count = sparse_mod._active_cells(coarse, jnp.float32(tau), 512)
    ids, ncd, ov, blk = marching._active_cells_from_coarse(
        jnp.asarray(vol), cell_ids, count, iso=0.0, stride=stride, bcap=768)
    nc = int(ncd)
    n_iter, batch = marching.records_n_iter(int(ids.shape[0]), nc, 512)
    rec_d, tq_d, _ = marching.records_dispatch(vol=jnp.asarray(vol), ids=ids,
                                               n_cells_d=ncd, iso=0.0,
                                               n_iter=n_iter, batch=batch)
    futs = marching.records_start_fetch_masked(rec_d, tq_d, blk)
    ev, ef = marching.records_finish_masked(futs, PARAMS, nc, R)()
    nv = int(marching._count_cross(rec_d))

    # happy path (masked): self-derived counts + identical mesh
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "masked")
    verts, faces, n_o, nv_o = fut.result()
    assert (n_o, nv_o) == (nc, nv)
    np.testing.assert_array_equal(faces, ef)
    np.testing.assert_array_equal(verts, ev)

    # happy path (compact)
    nvcap = marching._qbucket(max(4, int(nv * 1.15)))
    tqc_d, _ = marching._compact_tq(rec_d, tq_d, nvcap)
    cfuts = marching.records_start_fetch_compact(rec_d, tqc_d, blk)
    fut, cancel = marching.records_assemble_speculative(
        cfuts, PARAMS, R, "compact", nvcap)
    verts, faces, n_o, nv_o = fut.result()
    assert (n_o, nv_o) == (nc, nv)
    np.testing.assert_array_equal(faces, ef)
    np.testing.assert_array_equal(verts, ev)

    # compact-tq cap overflow: claimed nvcap below the true crossing count
    fut, cancel = marching.records_assemble_speculative(
        cfuts, PARAMS, R, "compact", nv - 1)
    assert fut.result() is None

    # slot under-coverage: records truncated below the scan's cell count
    from concurrent.futures import Future

    def done(v):
        f = Future()
        f.set_result(v)
        return f

    rec_np = np.asarray(rec_d)
    short = max(1, nc - 8)
    tfuts = [done(np.asarray(x)) for x in
             (tq_d[:short], tq_d[short:short], tq_d[short:short])]
    tfuts += [done(np.asarray(blk)), done(rec_np[:short])]
    fut, cancel = marching.records_assemble_speculative(
        tfuts, PARAMS, R, "masked")
    assert fut.result() is None

    # pre-set cancel: bails before assembling
    fut, cancel = marching.records_assemble_speculative(
        futs, PARAMS, R, "masked")
    cancel.set()
    # the worker may already have passed the first check; both outcomes
    # (early None or a completed mesh) are legal — only require no error
    res = fut.result()
    assert res is None or len(res) == 4


@pytest.mark.parametrize("r", [0.6, 1.3])
def test_candidate_scan_matches_full_scan(r):
    """_active_cells_from_coarse (scan limited to band-active coarse cells
    + ghost shell) emits the BIT-IDENTICAL fine-cell sequence as the
    full-volume _active_cells_ext, including boundary-crossing surfaces
    (r=1.3 > box)."""
    import jax.numpy as jnp
    from disn_tpu.infer import sparse as sparse_mod

    vol = sphere_volume(R=33, r=r)
    stride = 4
    coarse = jnp.asarray(vol[::stride, ::stride, ::stride])
    rc = coarse.shape[0]
    span = PARAMS[3:6] - PARAMS[0:3]
    tau = 1.5 * np.sqrt(np.sum((span / (rc - 1)) ** 2))
    cell_ids, count = sparse_mod._active_cells(coarse, jnp.float32(tau), 512)
    ids_c, nc_c, ov, blk = marching._active_cells_from_coarse(
        jnp.asarray(vol), cell_ids, count, iso=0.0, stride=stride, bcap=768)
    gcap = marching._norm_gcap(33, None)
    ids_f, nc_f, gov = marching._active_cells_ext(jnp.asarray(vol), 0.0,
                                                  gcap)
    assert int(ov) == 0 and int(gov) == 0
    n = int(nc_f)
    assert int(nc_c) == n and n > 0
    np.testing.assert_array_equal(np.asarray(ids_c)[:n],
                                  np.asarray(ids_f)[:n])
    # the block-mask stream expands to the SAME id sequence (numpy oracle
    # and the native C expander the masked fetch path uses)
    eids, en = marching.expand_block_ids_np(np.asarray(blk), 33)
    assert en == n
    np.testing.assert_array_equal(eids[:n], np.asarray(ids_f)[:n])
    from disn_tpu import native
    nids, nn = native.mesh_expand_ids(np.asarray(blk), 33)
    assert nn == n
    np.testing.assert_array_equal(nids[:n], np.asarray(ids_f)[:n])


def test_candidate_scan_guard_flags_missed_cells():
    """A field violating the band premise (sign changes outside the active
    coarse set) must flip the overflow flag, never silently drop cells."""
    import jax.numpy as jnp

    vol = sphere_volume(R=33, r=0.6)
    # claim NO active coarse cells: every change cell is 'missed'
    ids_c, nc_c, ov, _ = marching._active_cells_from_coarse(
        jnp.asarray(vol), jnp.zeros((8,), jnp.int32), jnp.int32(0),
        iso=0.0, stride=4, bcap=768)
    assert int(ov) > 0


def test_sharded_records_match_single():
    """Record pass striped over the points axis of an 8-device mesh emits
    the same records as the single-device pass (mesh extraction now shards
    like the dense/sparse volume paths)."""
    import jax
    import jax.numpy as jnp
    from disn_tpu.parallel import make_mesh

    vol = sphere_volume(R=33)
    gcap = marching._norm_gcap(33, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, 0.0, gcap)
    nc = int(ncd)
    batch = 512
    n_dev = len(jax.devices())
    n_iter = n_dev * max(1, -(-nc // (batch * n_dev)))
    rec1, tq1 = marching._extract_records(vold, ids, ncd, iso=0.0,
                                          n_iter=n_iter, batch=batch)
    mesh = make_mesh(data=1, points=n_dev)
    fn, n_slots = marching.make_sharded_records_fn(mesh, 33, iso=0.0,
                                                   n_iter=n_iter,
                                                   batch=batch)
    assert n_slots == n_iter * batch
    rec8, tq8 = fn(vold, ids, ncd)
    np.testing.assert_array_equal(np.asarray(rec8)[:nc],
                                  np.asarray(rec1)[:nc])
    np.testing.assert_array_equal(np.asarray(tq8)[:nc],
                                  np.asarray(tq1)[:nc])
    # and the assembled mesh equals the owned-path mesh
    av, af = marching.assemble_mesh_np(np.asarray(ids)[:nc],
                                       np.asarray(rec8),
                                       np.asarray(tq8), nc, 33, PARAMS)
    ev, ef = marching.extract_mesh_owned(vol, PARAMS)
    np.testing.assert_array_equal(af, ef)
    assert np.abs(av - ev).max() <= (2.0 / 32) / 65535 + 1e-6


def test_records_u8_quantization_at_production_scale():
    """R >= 129 switches the edge-t transfer to u8 (see _tq_bits): faces
    stay EXACTLY equal to the owned path; vertices move <= cell/255."""
    import jax.numpy as jnp

    R = 129
    assert marching._tq_bits(R) == 8 and marching._tq_bits(33) == 16
    vol = sphere_volume(R=R)
    ev, ef = marching.extract_mesh_owned(vol, PARAMS)
    gcap = marching._norm_gcap(R, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, 0.0, gcap)
    rv, rf = marching.extract_mesh_records(vold, PARAMS, ids, int(ncd))
    np.testing.assert_array_equal(rf, ef)
    assert np.abs(rv - ev).max() <= (2.0 / (R - 1)) / 255 + 1e-6


def test_extract_mesh_records_wrapper():
    """The full record-mode wrapper (parallel fetch + native-or-numpy
    assembly) against the owned path."""
    import jax.numpy as jnp

    vol = sphere_volume(R=33)
    ev, ef = marching.extract_mesh_owned(vol, PARAMS)
    R = vol.shape[0]
    gcap = marching._norm_gcap(R, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, 0.0, gcap)
    rv, rf = marching.extract_mesh_records(vold, PARAMS, ids, int(ncd))
    np.testing.assert_array_equal(rf, ef)
    assert np.abs(rv - ev).max() <= (2.0 / 32) / 65535 + 1e-6


def test_fit_batch_divides():
    """_fit_batch returns a divisor of the ids length: the record/owned
    extractors slice cell_ids with a CLAMPING dynamic_slice, so a partial
    final batch silently re-reads shifted cells (round-2 advisor finding:
    sparse_stride=2 gives ids buffers of bcap*8, not a multiple of the
    default 8192 batch)."""
    for n, b in [(10240, 8192), (640, 512), (1024, 512), (7, 8192),
                 (1, 4), (8192, 8192)]:
        fb = marching._fit_batch(n, b)
        assert fb <= b and n % fb == 0 and fb >= 1


def test_records_with_nonmultiple_ids_length():
    """extract_mesh_records on an ids buffer whose length is NOT a
    multiple of the requested batch must still reproduce the owned mesh
    (regression: the last clamped batch used to corrupt slot->cell
    alignment / fail the S-slice)."""
    import jax.numpy as jnp

    vol = sphere_volume(R=33)
    ev, ef = marching.extract_mesh_owned(vol, PARAMS)
    R = vol.shape[0]
    gcap = marching._norm_gcap(R, None)
    vold = jnp.asarray(vol, jnp.float32)
    ids, ncd, gov = marching._active_cells_ext(vold, 0.0, gcap)
    nc = int(ncd)
    # smallest multiple of 128 >= nc that is NOT a multiple of the batch
    L = -(-nc // 128) * 128
    batch = 512
    while L % batch == 0:
        L += 128
    assert L <= ids.shape[0]
    rv, rf = marching.extract_mesh_records(vold, PARAMS, ids[:L], nc,
                                           batch=batch)
    np.testing.assert_array_equal(rf, ef)
    assert np.abs(rv - ev).max() <= (2.0 / 32) / 65535 + 1e-6


def test_owned_empty_and_full():
    v, f = marching.extract_mesh_owned(np.ones((9, 9, 9), np.float32),
                                       PARAMS)
    assert len(v) == 0 and len(f) == 0
    v, f = marching.extract_mesh_owned(-np.ones((9, 9, 9), np.float32),
                                       PARAMS)
    assert len(v) == 0 and len(f) == 0


def test_chunked_matches_while_variant():
    import jax.numpy as jnp
    vol = sphere_volume(R=17)
    mt = 16384
    p1, k1, c1 = marching.marching_tets_jit(jnp.asarray(vol),
                                            jnp.asarray(PARAMS), max_tris=mt)
    p2, k2, c2 = marching.marching_tets_chunked(vol, PARAMS, max_tris=mt,
                                                cell_batch=512)
    assert int(c1) == int(c2)
    np.testing.assert_allclose(np.asarray(p1[:int(c1)]),
                               np.asarray(p2[:int(c2)]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k1[:int(c1)]),
                                  np.asarray(k2[:int(c2)]))


def test_derive_recs_matches_device_cross():
    """The u8 rec stream ships only the inside mask; the host derives the
    cross bits (_derive_recs, native C + numpy fallback). Pin both host
    paths bit-exactly to the device's u16 cross<<8|inside records for the
    same slots — including boundary (ghost) cells where edge aliasing
    suppresses crossings."""
    import jax.numpy as jnp
    from disn_tpu.infer import sparse as sparse_mod

    vol = sphere_volume(R=33, r=1.3)  # sphere > box: boundary cells active
    R = vol.shape[0]
    stride = 4
    coarse = jnp.asarray(vol[::stride, ::stride, ::stride])
    rc = coarse.shape[0]
    span = PARAMS[3:6] - PARAMS[0:3]
    tau = 1.5 * np.sqrt(np.sum((span / (rc - 1)) ** 2))
    cell_ids, count = sparse_mod._active_cells(coarse, jnp.float32(tau), 1024)
    ids, ncd, ov, blk = marching._active_cells_from_coarse(
        jnp.asarray(vol), cell_ids, count, iso=0.0, stride=stride, bcap=1536)
    nc = int(ncd)
    assert nc > 0 and int(ov) == 0
    n_iter, batch = marching.records_n_iter(int(ids.shape[0]), nc, 512)
    # device truth: the full u16 records for these slots
    rec16, _ = marching._extract_records(
        jnp.asarray(vol), ids, ncd, iso=0.0, n_iter=n_iter, batch=batch)
    want = np.asarray(rec16).astype(np.uint32)
    imask = (want & 0xFF).astype(np.uint8)
    blk_np = np.asarray(blk)
    got_native = marching._derive_recs(blk_np, imask, R)
    np.testing.assert_array_equal(got_native, want)
    # numpy fallback path must agree too
    import disn_tpu.ops.marching as m

    def no_native(*a, **k):
        raise OSError("forced fallback")
    import unittest.mock as mock
    with mock.patch("disn_tpu.native.derive_recs", side_effect=no_native):
        got_np = m._derive_recs(blk_np, imask, R)
    np.testing.assert_array_equal(got_np, want)
    # some boundary cell must exist for the aliasing branch to be covered
    ids_np = np.asarray(ids[:nc])
    assert ((ids_np % R == R - 1) | ((ids_np // R) % R == R - 1)
            | (ids_np // (R * R) == R - 1)).any()
