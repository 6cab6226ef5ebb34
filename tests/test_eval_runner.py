"""Evaluation-tree aggregation and resume semantics.

Pins the overall F-score aggregate against the reference's formula
(/root/reference/test/test_f_score.py:176-181): object-count-weighted
average of per-category precision/recall, THEN the harmonic mean — NOT a
mean of per-object F1s. Also covers the per-object metric cache (the
reference caches NN distances to txt for resume, test_f_score.py:203-231).
"""
import json
import os

import numpy as np
import pytest

from disn_tpu.core import codecs
from disn_tpu.eval import runner


def _tet(center, scale=0.1):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    return v * scale + np.asarray(center, np.float32), f


def _make_tree(root, cats):
    """cats: {cat: [(obj, pred_offset), ...]} — one view per object, pred
    mesh translated by pred_offset so P/R vary across objects."""
    lst_dir = os.path.join(root, "filelists")
    gt_dir = os.path.join(root, "gt")
    pred_dir = os.path.join(root, "pred")
    os.makedirs(lst_dir, exist_ok=True)
    for cat, objs in cats.items():
        with open(os.path.join(lst_dir, f"{cat}_test.lst"), "w") as f:
            f.write("\n".join(o for o, _ in objs))
        for obj, off in objs:
            v, fc = _tet((0, 0, 0))
            codecs.write_obj(os.path.join(gt_dir, cat, obj, "isosurf.obj"),
                             v, fc)
            vp, fp = _tet((off, 0, 0))
            codecs.write_obj(os.path.join(
                pred_dir, cat, f"{cat}_{obj}_00.obj"), vp, fp)
    return pred_dir, gt_dir, lst_dir


CATS = {"cata": [("o1", 0.0), ("o2", 0.05)], "catb": [("o3", 0.3)]}


def test_overall_fscore_weighted_aggregate(tmp_path):
    pred_dir, gt_dir, lst_dir = _make_tree(str(tmp_path), CATS)
    res = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, view_num=1,
                               metrics=["fscore"], num_points=64, workers=2)
    assert res["total_objects"] == 3
    ca, cb = res["categories"]["cata"], res["categories"]["catb"]
    # per-category P/R are means over objects; overall = count-weighted
    # average of the category vectors, harmonic mean LAST
    pre = (np.asarray(ca["f_precision"]) * 2 + np.asarray(cb["f_precision"])
           ) / 3
    rec = (np.asarray(ca["f_recall"]) * 2 + np.asarray(cb["f_recall"])) / 3
    f1 = 2 * pre * rec / np.maximum(pre + rec, 1e-9)
    np.testing.assert_allclose(res["overall"]["f_precision"], pre, rtol=1e-6)
    np.testing.assert_allclose(res["overall"]["f_recall"], rec, rtol=1e-6)
    np.testing.assert_allclose(res["overall"]["f1"], f1, rtol=1e-6)
    # the offsets straddle the thresholds, so the aggregate is non-trivial
    # (catb's 0.3 offset exceeds the largest threshold 0.2*2.5*0.01=0.5? no:
    # thresholds are {0.5..20}% * 2.5 = 0.0125..0.5; 0.3 fails the small
    # ones, passes 0.5) — identical cata/o1 scores 1.0 everywhere
    assert res["overall"]["f1"][0] < 1.0
    assert ca["f1"][-1] == pytest.approx(1.0)
    # weighted F1 of the harmonic means would differ from harmonic-of-
    # weighted when categories diverge: assert we did NOT do that
    naive = (np.asarray(ca["f1"]) * 2 + np.asarray(cb["f1"])) / 3
    assert not np.allclose(res["overall"]["f1"], naive)


def test_cache_resume_skips_finished_objects(tmp_path, monkeypatch):
    pred_dir, gt_dir, lst_dir = _make_tree(str(tmp_path), CATS)
    cache = str(tmp_path / "cache")
    calls = []
    real = runner._object_host  # the cache-miss work lives in the host half

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(runner, "_object_host", counting)
    kw = dict(view_num=1, metrics=["cd", "fscore"], num_points=64,
              workers=1, cache_dir=cache)
    res1 = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw)
    assert len(calls) == 3
    assert os.path.exists(os.path.join(cache, "cata", "o1.json"))
    # resume: all objects cached, zero recomputation, identical results
    calls.clear()
    res2 = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw)
    assert len(calls) == 0
    assert json.dumps(res1, sort_keys=True) == json.dumps(res2,
                                                          sort_keys=True)
    # partial kill: drop one cache file -> exactly one recompute
    os.remove(os.path.join(cache, "catb", "o3.json"))
    calls.clear()
    res3 = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw)
    assert len(calls) == 1
    assert json.dumps(res1["overall"], sort_keys=True) == \
        json.dumps(res3["overall"], sort_keys=True)
    # a config change invalidates the key (no stale hits)
    calls.clear()
    kw2 = dict(kw, num_points=32)
    runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw2)
    assert len(calls) == 3


def test_cache_torn_file_recomputes(tmp_path):
    pred_dir, gt_dir, lst_dir = _make_tree(str(tmp_path), CATS)
    cache = str(tmp_path / "cache")
    kw = dict(view_num=1, metrics=["cd"], num_points=64, workers=1,
              cache_dir=cache)
    res1 = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw)
    # corrupt one entry the way a kill mid-write would NOT (os.replace is
    # atomic) but a disk error could: must recompute, not crash
    with open(os.path.join(cache, "cata", "o1.json"), "w") as f:
        f.write("{not json")
    res2 = runner.evaluate_tree(pred_dir, gt_dir, lst_dir, **kw)
    assert res1["overall"]["cd_avg"] == pytest.approx(
        res2["overall"]["cd_avg"])
