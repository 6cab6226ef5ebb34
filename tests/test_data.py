"""Data pipeline tests: synthetic fixture, listing, sampler quotas, batch
assembly, prefetch loader, and camera/renderer consistency."""
import numpy as np
import pytest

from disn_tpu.core import camera, codecs
from disn_tpu.data import listing, pipeline, synthetic


@pytest.fixture(scope="module")
def fixture_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    info = synthetic.build_dataset(str(root), views=2, num_samples=2048,
                                   grid_res=16)
    return info


def test_build_dataset_tree(fixture_ds):
    info = fixture_ds
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    assert len(listinfo) == 3 * 2  # 3 shapes x 2 views
    assert cats_limit == {synthetic.SYNTH_CAT: 6}
    sdf = codecs.read_sdf_h5(
        listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
        .sdf_path(synthetic.SYNTH_CAT, "sphere0"))
    assert sdf.sample_pt.shape == (2048, 3)
    # stored sdf values match the analytic sphere sdf
    ref = synthetic.sdf_sphere(sdf.sample_pt)
    np.testing.assert_allclose(sdf.sample_sdf, ref, atol=1e-5)


def test_stratified_bands():
    s = synthetic.stratified_sample(synthetic.sdf_sphere, num=4096,
                                    bandwidth=0.1)
    v = s[:, 3]
    for lo, hi in [(-np.inf, -0.1), (-0.1, 0.0), (0.0, 0.1), (0.1, np.inf)]:
        frac = np.mean((v > lo) & (v <= hi))
        assert frac > 0.2, f"band ({lo},{hi}] underfilled: {frac}"


def test_epoch_sampler_quota(fixture_ds):
    info = fixture_ds
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    sampler = pipeline.EpochSampler(listinfo, cats_limit, cat_limit=4)
    order = sampler.epoch_order()
    assert len(order) == 4  # quota capped below the 6 available
    assert len(set(order.tolist())) == 4
    # two epochs differ under shuffle (with these sizes, overwhelmingly likely)
    o2 = sampler.epoch_order()
    assert len(o2) == 4


def test_epoch_sampler_host_shard(fixture_ds):
    info = fixture_ds
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    orders = []
    for hid in range(2):
        s = pipeline.EpochSampler(listinfo, cats_limit, cat_limit=64,
                                  seed=7, host_id=hid, host_count=2)
        orders.append(s.epoch_order())
    assert len(orders[0]) == len(orders[1]) == 3
    assert set(orders[0].tolist()).isdisjoint(orders[1].tolist())


def test_multi_host_loader_harness(fixture_ds):
    """Multi-host data loading end to end: one PrefetchLoader per simulated
    host (host_id/host_count), full pipeline (workers, prefetch, ordered
    consumer). Hosts consume DISJOINT example sets whose union covers the
    host-truncated epoch — the SPMD input contract for multi-host training
    (reference scale-out is manual per-GPU splits, README.md:104-110)."""
    info = fixture_ds
    cfg = synthetic.tiny_config()
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    seen = []
    for hid in range(2):
        loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                      epochs=1, workers=2, seed=11,
                                      host_id=hid, host_count=2)
        loader.drop_ids = False
        loader.start()
        ids = [tuple(i) for _, batch_ids in loader for i in batch_ids]
        loader.shutdown()
        seen.append(set(ids))
    assert seen[0] and seen[1]
    assert seen[0].isdisjoint(seen[1])
    per_host = (len(listinfo) // 2 // cfg.batch_size) * cfg.batch_size
    assert len(seen[0] | seen[1]) == 2 * per_host


def test_batch_shapes_and_projection(fixture_ds):
    info = fixture_ds
    cfg = synthetic.tiny_config()
    listinfo, _ = listing.load_split(info["lst_dir"], info["cats"], "train",
                                     view_num=info["views"])
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    ds = pipeline.SdfImageDataset(cfg, paths, listinfo, seed=0)
    batch, ids = ds.get_batch(np.arange(cfg.batch_size))
    assert batch["img"].shape == (2, 137, 137, 3)
    assert batch["img"].dtype == np.float32
    assert batch["sdf_pt"].shape == (2, 256, 3)
    assert batch["sdf_val"].shape == (2, 256, 1)
    assert batch["trans_mat"].shape == (2, 4, 3)
    assert 0.0 <= batch["img"].min() and batch["img"].max() <= 1.0
    assert ids[0][0] == synthetic.SYNTH_CAT

    # integration: surface points must project inside the rendered silhouette
    import jax.numpy as jnp
    fn = info["shapes"][ids[0][1]]
    surf = synthetic.surface_points(fn, num=256)
    px = np.asarray(camera.project_points(
        jnp.asarray(surf[None]), jnp.asarray(batch["trans_mat"][:1])))[0]
    rec = codecs.read_view_h5(paths.img_path(*ids[0]))
    alpha = rec.img_arr[:, :, 3] > 0
    # dilate silhouette by 2px to absorb the tracer's hit tolerance
    from scipy import ndimage
    grown = ndimage.binary_dilation(alpha, iterations=2)
    xi = np.clip(np.round(px[:, 0]).astype(int), 0, 136)
    yi = np.clip(np.round(px[:, 1]).astype(int), 0, 136)
    inside = grown[yi, xi].mean()
    assert inside > 0.97, f"only {inside:.2%} of surface projections in mask"


def test_prefetch_loader_order_and_count(fixture_ds):
    info = fixture_ds
    cfg = synthetic.tiny_config()
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    loader = pipeline.make_loader(cfg, paths, listinfo, cats_limit,
                                  epochs=2, workers=2, seed=3)
    loader.start()
    batches = list(loader)
    assert len(batches) == len(loader) == 2 * (6 // cfg.batch_size)
    for b in batches:
        assert b["img"].shape[0] == cfg.batch_size
    loader.shutdown()


def test_rot_batch(fixture_ds):
    info = fixture_ds
    cfg = synthetic.tiny_config(rot=True)
    listinfo, _ = listing.load_split(info["lst_dir"], info["cats"], "train",
                                     view_num=info["views"])
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    ds = pipeline.SdfImageDataset(cfg, paths, listinfo, seed=0)
    ex = ds.get_example(0)
    rec = codecs.read_view_h5(paths.img_path(*listinfo[0]))
    np.testing.assert_allclose(ex["sdf_pt_rot"],
                               ex["sdf_pt"] @ rec.obj_rot_mat, atol=1e-6)
    # rotation preserves norms
    np.testing.assert_allclose(np.linalg.norm(ex["sdf_pt_rot"], axis=1),
                               np.linalg.norm(ex["sdf_pt"], axis=1), atol=1e-4)


def test_loader_error_propagation(fixture_ds):
    """A worker exception must surface to the consumer, not hang the loop."""
    info = fixture_ds
    cfg = synthetic.tiny_config()
    listinfo, cats_limit = listing.load_split(
        info["lst_dir"], info["cats"], "train", view_num=info["views"])
    # poison one path: nonexistent object
    bad = listinfo + [(synthetic.SYNTH_CAT, "missing0", 0)] * 4
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    loader = pipeline.make_loader(cfg, paths, bad,
                                  {synthetic.SYNTH_CAT: len(bad)},
                                  epochs=1, workers=2, shuffle=False)
    loader.start()
    with pytest.raises(Exception):
        for _ in loader:
            pass
    loader.shutdown()


def test_view_cache_not_mutated_by_augmentation(fixture_ds):
    """Cached view records must stay pristine across augmenting fetches."""
    info = fixture_ds
    cfg = synthetic.tiny_config(backcolorwhite=True)
    listinfo, _ = listing.load_split(info["lst_dir"], info["cats"], "train",
                                     view_num=info["views"])
    paths = listing.SplitPaths(info["sdf_dir"], info["rendered_dir"])
    ds = pipeline.SdfImageDataset(cfg, paths, listinfo, seed=0)
    a = ds.get_example(0)["img"].copy()
    rec_cached = ds._read_view(*listinfo[0])
    raw1 = rec_cached.img_arr.copy()
    b = ds.get_example(0)["img"]
    np.testing.assert_array_equal(rec_cached.img_arr, raw1)
    # backcolorwhite is deterministic, so repeated fetches agree
    np.testing.assert_array_equal(a, b)


def test_bundled_shapenet_filelists():
    """The 26 reference split lists ship with the package; real counts hold
    (reference data/filelists: chair 03001627 train 5268 / test 1311)."""
    from disn_tpu.config import CATS
    import os

    assert os.path.isdir(listing.BUNDLED_FILELISTS)
    for split in ("train", "test"):
        for cat_id in CATS.values():
            assert os.path.exists(os.path.join(
                listing.BUNDLED_FILELISTS, f"{cat_id}_{split}.lst")), cat_id

    listinfo, cats_limit = listing.load_split("", dict(CATS), "train",
                                              view_num=24)
    assert cats_limit["03001627"] == 5268 * 24
    assert len(cats_limit) == 13
    test_info, test_limit = listing.load_split(
        listing.BUNDLED_FILELISTS, dict(CATS), "test", view_num=24)
    assert test_limit["03001627"] == 1311 * 24

    # EpochSampler quotas honour the reference's cat_limit=36000 config
    sampler = pipeline.EpochSampler(listinfo, cats_limit, cat_limit=36000)
    order = sampler.epoch_order()
    assert len(order) == sum(min(36000, n) for n in cats_limit.values())
    assert len(order) <= 13 * 36000
