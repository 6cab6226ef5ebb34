"""Training/eval data pipeline: h5 reading, category-balanced sampling,
multi-worker host prefetch, and device double-buffering.

Re-imagines data/data_sdf_h5_queue.py (threaded producer + queue.Queue(64)):
the single producer thread becomes a worker pool assembling batches, and
`fetch()` becomes an iterator that keeps the *next* batch already on device
(`jax.device_put` double-buffering) so the TPU never waits on host I/O.
Per-host sharding for multi-host meshes drops a deterministic slice of every
epoch order (`host_id`/`host_count`).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import jax
import numpy as np

from disn_tpu.config import Config
from disn_tpu.core import codecs
from disn_tpu.data.listing import ListInfo, SplitPaths


class EpochSampler:
    """Category-balanced epoch ordering.

    Mirrors set_cat_limit + refill_data_order (data_sdf_h5_queue.py:59-66,
    305-317): per-category quota = min(cfg.cat_limit, available); each epoch
    shuffles the full index list and takes entries first-come until every
    category hits its quota. Deterministic given its rng state.
    """

    def __init__(self, listinfo: ListInfo, cats_limit: dict[str, int],
                 cat_limit: int, shuffle: bool = True, seed: int = 0,
                 host_id: int = 0, host_count: int = 1):
        self.listinfo = listinfo
        self.cats_limit = {c: min(cat_limit, n) for c, n in cats_limit.items()}
        self.epoch_amount = sum(self.cats_limit.values())
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.host_id = host_id
        self.host_count = host_count

    def epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.listinfo))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.epoch_amount < len(self.listinfo):
            quota = dict(self.cats_limit)
            picked = []
            for idx in order:
                cat_id = self.listinfo[idx][0]
                if quota.get(cat_id, 0) > 0:
                    picked.append(idx)
                    quota[cat_id] -= 1
                if len(picked) == self.epoch_amount:
                    break
            order = np.asarray(picked)
        # per-host shard: every host sees a disjoint contiguous stripe
        if self.host_count > 1:
            per = len(order) // self.host_count
            order = order[self.host_id * per:(self.host_id + 1) * per]
        return order


class SdfImageDataset:
    """Per-item loading + batch assembly (numpy, host side).

    Batch dict mirrors get_batch (data_sdf_h5_queue.py:240-303):
      pc [B,P,3], sdf_pt [B,N,3], sdf_pt_rot [B,N,3], sdf_val [B,N,1],
      norm_params [B,4], sdf_params [B,6], img [B,H,W,3|4] float /255,
      trans_mat [B,4,3], regress_mat [B,4,3].
    String ids (cat_id/obj/view) are returned separately so batches stay pure
    arrays ready for device_put.
    """

    def __init__(self, cfg: Config, paths: SplitPaths, listinfo: ListInfo,
                 seed: int = 0):
        self.cfg = cfg
        self.paths = paths
        self.listinfo = listinfo
        self.rng = np.random.RandomState(seed + 1)
        self._sdf_cache: dict[str, codecs.SdfSamples] = {}
        self._view_cache: dict[str, codecs.ViewRecord] = {}
        self._cache_lock = threading.Lock()
        self.cache_size = 8192
        self.view_cache_size = 4096

    def _load_sdf(self, cat_id: str, obj: str) -> codecs.SdfSamples:
        key = f"{cat_id}/{obj}"
        with self._cache_lock:
            hit = self._sdf_cache.get(key)
        if hit is not None:
            return hit
        rec = codecs.read_sdf_h5(self.paths.sdf_path(cat_id, obj))
        with self._cache_lock:
            if len(self._sdf_cache) < self.cache_size:
                self._sdf_cache[key] = rec
        return rec

    @staticmethod
    def random_shift(raw: np.ndarray, rng: np.random.RandomState
                     ) -> tuple[np.ndarray, np.ndarray]:
        """2-DoF object translation augmentation for the cam-net's xyshift
        head (data_sdf_h5_queue_mask_imgh5_cammat.py:258-275): shift the
        object's pixels within 0.7x of its free margins; target is
        (x, y) * 2 / img_h."""
        h, w = raw.shape[:2]
        alpha = np.argwhere(raw[:, :, 3] > 0)
        if len(alpha) == 0:
            return raw, np.zeros(2, np.float32)
        top = alpha[:, 0].min()
        down = h - alpha[:, 0].max()
        left = alpha[:, 1].min()
        right = w - alpha[:, 1].max()

        def rand_range(lo, hi):
            lo, hi = int(-lo * 0.7), int(hi * 0.7)
            return rng.randint(lo, hi) if hi > lo else 0

        y_shift = rand_range(top, down)
        x_shift = rand_range(left, right)
        out = np.zeros_like(raw)
        out[alpha[:, 0] + y_shift, alpha[:, 1] + x_shift] = \
            raw[alpha[:, 0], alpha[:, 1]]
        return out, np.asarray([x_shift, y_shift], np.float32) * 2.0 / h

    def _read_view(self, cat_id: str, obj: str, view: int
                   ) -> codecs.ViewRecord:
        key = f"{cat_id}/{obj}/{view}"
        with self._cache_lock:
            hit = self._view_cache.get(key)
        if hit is not None:
            return hit
        rec = codecs.read_view_h5(self.paths.img_path(cat_id, obj, view))
        with self._cache_lock:
            if len(self._view_cache) < self.view_cache_size:
                self._view_cache[key] = rec
        return rec

    def _load_img(self, cat_id: str, obj: str, view: int,
                  rng: np.random.RandomState) -> dict[str, np.ndarray]:
        cfg = self.cfg
        rec = self._read_view(cat_id, obj, view)
        raw = rec.img_arr
        shifts = None
        if cfg.cam_shift:
            raw, shifts = self.random_shift(raw, rng)
        if cfg.alpha:
            img = raw[:, :, :4].astype(np.float32) / 255.0
        else:
            img = raw[:, :, :3].astype(np.float32)
            alpha = raw[:, :, 3]
            # color augmentation (data_sdf_h5_queue.py:169-183). The reference
            # computes but never applies the fore/back shifts (a `+` with no
            # assignment); we implement the evident intent and gate it off by
            # default, matching observable reference behavior when flags are off.
            if cfg.augcolorfore or cfg.augcolorback:
                aug = rng.rand(3).astype(np.float32) * 60.0 - 30.0
                if cfg.augcolorfore:
                    img[alpha != 0] += aug
                if cfg.augcolorback:
                    img[alpha == 0] += aug
            if cfg.backcolorwhite:
                img[alpha == 0] = 255.0
            img = np.clip(img, 0.0, 255.0) / 255.0
        out = {
            "img": img,
            "trans_mat": rec.trans_mat,
            "regress_mat": rec.regress_mat,
            "obj_rot_mat": rec.obj_rot_mat,
        }
        if shifts is not None:
            out["shifts"] = shifts
        return out

    def get_example(self, index: int,
                    rng: np.random.RandomState | None = None
                    ) -> dict[str, np.ndarray]:
        cfg = self.cfg
        rng = rng or self.rng
        cat_id, obj, view = self.listinfo[index]
        sdf = self._load_sdf(cat_id, obj)
        view_rec = self._load_img(cat_id, obj, view, rng)

        n = cfg.num_sample_points
        out: dict[str, np.ndarray] = {}
        # surface-point slot (used by debug dumps / chamfer diagnostics)
        pick = rng.randint(sdf.ori_pt.shape[0], size=cfg.num_points)
        out["pc"] = sdf.ori_pt[pick]
        if sdf.sample_pt is None:  # full-grid variant (3D-CNN baseline)
            out["sdf_pt"] = np.zeros((n, 3), np.float32)
            out["sdf_pt_rot"] = out["sdf_pt"]
            out["sdf_val"] = sdf.sample_sdf[:, None].astype(np.float32)
        else:
            total = sdf.sample_pt.shape[0]
            if n > total:
                choice = rng.randint(total, size=n)
            else:
                choice = rng.choice(total, size=n, replace=False)
            pts = sdf.sample_pt[choice]
            out["sdf_pt"] = pts
            out["sdf_val"] = sdf.sample_sdf[choice, None].astype(np.float32)
            if cfg.rot:
                out["sdf_pt_rot"] = pts @ view_rec["obj_rot_mat"]
            else:
                out["sdf_pt_rot"] = pts
        out["norm_params"] = sdf.norm_params
        out["sdf_params"] = sdf.sdf_params
        keys = ("img", "trans_mat", "regress_mat")
        out.update({k: view_rec[k] for k in keys})
        if "shifts" in view_rec:
            out["shifts"] = view_rec["shifts"]
        return out

    def get_batch(self, indices: np.ndarray,
                  rng: np.random.RandomState | None = None
                  ) -> tuple[dict[str, np.ndarray], list[tuple[str, str, int]]]:
        examples = [self.get_example(int(i), rng) for i in indices]
        batch = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
        ids = [self.listinfo[int(i)] for i in indices]
        return batch, ids


class PrefetchLoader:
    """Multi-worker batch producer + device double-buffer.

    Host side: `workers` threads each assemble whole batches (h5 reads release
    the GIL) into a bounded queue — the reference's single producer thread
    (data_sdf_h5_queue.py:319-337) generalized. Device side: the iterator
    keeps one batch in flight via jax.device_put with an optional
    NamedSharding, so step N's compute overlaps step N+1's transfer.
    """

    def __init__(self, dataset: SdfImageDataset, sampler: EpochSampler,
                 batch_size: int, epochs: int, workers: int = 4,
                 qsize: int = 16, sharding: Any = None, drop_ids: bool = True,
                 seed: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.epochs = epochs
        self.workers = workers
        self.sharding = sharding
        self.drop_ids = drop_ids
        self.seed = seed
        self._q: queue.Queue = queue.Queue(qsize)
        self._work_q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        stripe = (min(sampler.epoch_amount, len(sampler.listinfo))
                  // sampler.host_count)
        self.batches_per_epoch = max(1, stripe // batch_size)
        self.total_batches = self.batches_per_epoch * epochs

    # -- host producer ------------------------------------------------------
    def _producer(self, wid: int):
        rng = np.random.RandomState(self.seed + 977 * wid)
        while not self._stop.is_set():
            try:
                item = self._work_q.get(timeout=0.2)
            except queue.Empty:
                continue
            if item is None:
                return
            bno, indices = item
            try:
                batch, ids = self.dataset.get_batch(indices, rng)
                self._q.put((bno, batch, ids))
            except Exception as e:  # surface loader errors to the consumer
                self._q.put((bno, e, None))

    def start(self):
        # enqueue all work up front (index lists are tiny)
        for ep in range(self.epochs):
            order = self.sampler.epoch_order()
            for b in range(self.batches_per_epoch):
                sl = order[b * self.batch_size:(b + 1) * self.batch_size]
                if len(sl) < self.batch_size:  # wrap like the reference
                    sl = np.concatenate([sl, order[:self.batch_size - len(sl)]])
                self._work_q.put((ep * self.batches_per_epoch + b, sl))
        for w in range(self.workers):
            self._work_q.put(None)
            t = threading.Thread(target=self._producer, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def shutdown(self):
        self._stop.set()
        for q_ in (self._work_q, self._q):
            while True:
                try:
                    q_.get_nowait()
                except queue.Empty:
                    break

    # -- consumer -----------------------------------------------------------
    def _host_batches(self) -> Iterator[Any]:
        """Yield batches in order (workers may complete out of order)."""
        pending: dict[int, Any] = {}
        want = 0
        served = 0
        while served < self.total_batches:
            while want not in pending:
                bno, batch, ids = self._q.get()
                pending[bno] = (batch, ids)
            batch, ids = pending.pop(want)
            if isinstance(batch, Exception):
                self.shutdown()
                raise batch
            yield (batch, ids) if not self.drop_ids else batch
            want += 1
            served += 1

    def __iter__(self) -> Iterator[Any]:
        def put(x):
            arrays = x[0] if isinstance(x, tuple) else x
            dev = jax.device_put(arrays, self.sharding)
            return (dev, x[1]) if isinstance(x, tuple) else dev

        it = self._host_batches()
        prev = None
        for host_batch in it:
            nxt = put(host_batch)
            if prev is not None:
                yield prev
            prev = nxt
        if prev is not None:
            yield prev

    def __len__(self) -> int:
        return self.total_batches


def make_loader(cfg: Config, paths: SplitPaths, listinfo: ListInfo,
                cats_limit: dict[str, int], epochs: int = 1,
                shuffle: bool | None = None, sharding: Any = None,
                workers: int = 4, seed: int = 0, host_id: int = 0,
                host_count: int = 1) -> PrefetchLoader:
    dataset = SdfImageDataset(cfg, paths, listinfo, seed=seed)
    sampler = EpochSampler(
        listinfo, cats_limit, cfg.cat_limit,
        shuffle=cfg.shuffle if shuffle is None else shuffle,
        seed=seed, host_id=host_id, host_count=host_count)
    return PrefetchLoader(dataset, sampler, cfg.batch_size, epochs,
                          workers=workers, sharding=sharding, seed=seed)
