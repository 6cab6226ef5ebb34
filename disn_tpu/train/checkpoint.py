"""Checkpointing: atomic flat-npz save/restore with explicit param-subset
composition.

Replaces TF1 tf.train.Saver (train/train_sdf.py:190-219, 285-328):
* full-state checkpoints (params + optimizer + step) as a single atomic
  .npz of path-flattened leaves — portable and fast at this model scale
  (~30M params); swap for orbax sharded checkpointing if models outgrow it;
* ``merge_scopes`` replaces the reference's variable-name-prefix partial
  restore (load_model): compose a param tree from another checkpoint's
  top-level scopes (vgg_16, sdfprediction, ...) with shape-mismatch skipping —
  explicit tree subsets instead of string matching;
* best/periodic/latest retention mirroring the reference's policy
  (best-accuracy model.ckpt + every-10-epoch snapshots + latest.ckpt).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

Params = dict[str, Any]


# --------------------------------------------------------------------------
# Low-level tree <-> flat-npz codec. One .npz per checkpoint keeps restores
# trivially portable (no directory trees, no async machinery needed at this
# model scale: ~30M params, <150MB).
# --------------------------------------------------------------------------

_SEP = "$"


def _key_str(p: Any) -> str:
    if hasattr(p, "key"):     # DictKey
        return str(p.key)
    if hasattr(p, "name"):    # GetAttrKey (namedtuple/struct fields)
        return str(p.name)
    return str(p.idx)         # SequenceKey


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_SEP.join(_key_str(p) for p in path)] = np.asarray(leaf)
    return flat


def save(path: str, tree: Any, metadata: dict | None = None) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    flat = _flatten(tree)
    if metadata is not None:
        flat["__metadata__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_metadata(path: str) -> dict:
    with np.load(path) as z:
        if "__metadata__" in z:
            return json.loads(bytes(z["__metadata__"]).decode())
    return {}


def restore(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (shapes must match)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != "__metadata__"}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for path_t, leaf in leaves:
        key = _SEP.join(_key_str(p) for p in path_t)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"{key}: checkpoint shape {arr.shape} != target {leaf.shape}")
        out.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), out)


def restore_params(path: str) -> Params:
    """Restore a params dict without a target structure (nested dicts only,
    list indices re-materialized as dict keys are not supported here)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != "__metadata__"}
    tree: Params = {}
    for key, arr in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def merge_scopes(params: Params, ckpt_params: Params,
                 scopes: tuple[str, ...] | None = None,
                 skip_mismatch: bool = True,
                 skip_substr: tuple[str, ...] = ()) -> tuple[Params, list[str]]:
    """Overlay ``ckpt_params`` onto ``params`` for the given top-level scopes.

    Mirrors load_model's prefix+shape-match semantics (train_sdf.py:190-219):
    a leaf is taken from the checkpoint iff its path exists in ``params``,
    shapes agree (else skipped when skip_mismatch), and no skip_substr matches
    (the reference skips '*logits*' when restoring ImageNet VGG). Returns the
    merged tree and the list of skipped leaf paths.
    """
    skipped: list[str] = []

    def overlay(dst, src, path):
        if not isinstance(dst, dict) or not isinstance(src, dict):
            return
        for k, v in src.items():
            p = f"{path}/{k}" if path else k
            if any(s in p for s in skip_substr):
                skipped.append(p)
                continue
            if k not in dst:
                skipped.append(p)
                continue
            if isinstance(v, dict):
                overlay(dst[k], v, p)
            else:
                if hasattr(dst[k], "shape") and tuple(dst[k].shape) != tuple(v.shape):
                    if skip_mismatch:
                        skipped.append(p)
                        continue
                    raise ValueError(f"{p}: {v.shape} != {dst[k].shape}")
                dst[k] = np.asarray(v)

    merged = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    src = ckpt_params
    if scopes is not None:
        src = {k: v for k, v in ckpt_params.items() if k in scopes}
    overlay(merged, src, "")
    return merged, skipped


class CheckpointManager:
    """Retention policy: latest every save, best by metric, periodic epochs."""

    def __init__(self, directory: str, period: int = 10):
        self.dir = directory
        self.period = period
        self.best_metric = -np.inf
        os.makedirs(directory, exist_ok=True)

    def save_latest(self, tree: Any, step: int, **meta):
        save(os.path.join(self.dir, "latest.npz"), tree,
             {"step": int(step), **meta})

    def save_epoch(self, tree: Any, epoch: int, metric: float | None = None,
                   **meta):
        md = {"epoch": int(epoch), **meta}
        if metric is not None and metric > self.best_metric:
            self.best_metric = float(metric)
            save(os.path.join(self.dir, "best.npz"), tree,
                 {**md, "metric": float(metric)})
        if epoch % self.period == 0:
            save(os.path.join(self.dir, f"epoch_{epoch:03d}.npz"), tree, md)

    def latest_path(self) -> str | None:
        p = os.path.join(self.dir, "latest.npz")
        return p if os.path.exists(p) else None

    def best_path(self) -> str | None:
        p = os.path.join(self.dir, "best.npz")
        return p if os.path.exists(p) else None
