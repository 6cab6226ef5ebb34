"""Training: optimizer, schedules, jitted sharded train steps.

Re-imagines train/train_sdf.py + cam_est/train_sdf_cam.py: the TF1
graph/session/feed_dict machinery becomes one pure jitted ``train_step`` whose
batch inputs are sharded over the mesh's data axis — XLA inserts the gradient
all-reduce over ICI (the only collective training needs, SURVEY.md §2.9 P1).

Optimizer parity: Adam(beta1=0.5) or SGD-momentum (train_sdf.py:248-251),
staircase exponential LR decay by *samples seen* with a 1e-6 floor
(get_learning_rate, train_sdf.py:153-161), L1 SDF loss with near-surface
up-weighting and the -0.003 iso offset applied to the fed ground truth
(train_sdf.py:375, model_normalization.py:285-290).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from disn_tpu.config import Config
from disn_tpu.models import disn, posenet

Params = dict[str, Any]


def lr_schedule(cfg: Config) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Staircase exponential decay in units of samples, floored at lr_floor."""

    def schedule(step):
        samples = step * cfg.batch_size
        k = jnp.floor(samples / cfg.lr_decay_step)
        lr = cfg.learning_rate * jnp.power(cfg.lr_decay_rate, k)
        return jnp.maximum(lr, cfg.lr_floor)

    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    if cfg.optimizer == "momentum":
        return optax.sgd(sched, momentum=cfg.momentum)
    return optax.adam(sched, b1=cfg.beta1)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Params) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def create_state(cfg: Config, key: jax.Array,
                 init_fn: Callable[[Config, jax.Array], Params] = disn.init,
                 params: Params | None = None) -> TrainState:
    if params is None:
        params = init_fn(cfg, key)
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def to_model_batch(batch: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Map loader keys (reference naming) to model-forward keys."""
    out = {
        "img": batch["img"],
        "sample_pc": batch["sdf_pt"],
        "trans_mat": batch["trans_mat"],
    }
    if "sdf_pt_rot" in batch:
        out["sample_pc_rot"] = batch["sdf_pt_rot"]
    return out


def make_train_step(cfg: Config, donate: bool = True):
    """Jitted SDF train step: (state, batch) -> (state, metrics).

    Shard batches on the mesh data axis before calling (parallel.shard_batch
    or a sharded loader); params replicate and XLA all-reduces the grads.
    """

    def loss_fn(params, batch):
        # fold=True: folded-137 sampling (4 gather/scatter rows per point
        # instead of 80) — the step measured sampling-bound, 3.6 -> ~17+
        # steps/s at B=20 full width (see disn.apply fold docstring)
        end_points = disn.apply(params, to_model_batch(batch), cfg,
                                fold=True)
        gt = batch["sdf_val"] - cfg.iso_offset
        loss, losses = disn.get_loss(end_points, gt, params, cfg)
        return loss, losses

    def step(state: TrainState, batch: dict[str, jnp.ndarray]):
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads)
        losses["lr"] = lr_schedule(cfg)(state.step)
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Config):
    """Jitted metric-only step (test/test_sdf_acc.py equivalent)."""

    def step(params: Params, batch: dict[str, jnp.ndarray]):
        end_points = disn.apply(params, to_model_batch(batch), cfg,
                                fold=True)
        gt = batch["sdf_val"] - cfg.iso_offset
        _, losses = disn.get_loss(end_points, gt, params, cfg)
        return losses

    return jax.jit(step)


def make_cam_train_step(cfg: Config, donate: bool = True):
    """Jitted camera-pose train step (cam_est/train_sdf_cam.py).

    batch keys: img, sample_pc, RT (regress_mat), trans_mat, optional shifts.
    """

    def loss_fn(params, batch):
        end_points = posenet.apply(params, batch["img"][..., :3], cfg)
        loss, losses = posenet.get_loss(end_points, batch, params, cfg)
        return loss, losses

    def step(state: TrainState, batch: dict[str, jnp.ndarray]):
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads)
        losses["lr"] = lr_schedule(cfg)(state.step)
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,) if donate else ())
