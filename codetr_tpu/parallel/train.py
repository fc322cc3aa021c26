"""Sharded training step with the real Co-DINO query-head losses.

The reference ships no trainer (SURVEY.md: inference-deployment repo; its
training configs exist only for upstream mmdet).  The TPU build provides the
training path anyway: pre-topk per-layer predictions
(CoDETR.train_outputs), Hungarian matching + QFL/L1/GIoU losses over every
decoder layer and the encoder stage (parallel/losses.py, mirroring the
reference training config :107-113,:197-204), and a jit-able, mesh-sharded
train step with optax.

Sharding: dp over batch, tp over FFN/attention weights (see parallel/mesh.py);
gradients are averaged across dp by XLA-inserted collectives (jit + GSPMD —
there is no hand-written NCCL analog, by design).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from codetr_tpu.parallel.losses import dino_detection_loss
from codetr_tpu.parallel.mesh import batch_sharding, replicated, shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_train_step(model, tx: optax.GradientTransformation):
    """Targets: gt_boxes (bs, max_gt, 4) normalized cxcywh, gt_labels
    (bs, max_gt) int32, gt_valid (bs, max_gt) bool — static max_gt padding."""

    def loss_fn(params, batch_inputs, img_masks, gt_boxes, gt_labels, gt_valid):
        out = model.apply(params, batch_inputs, img_masks, method=model.train_outputs)
        total, _ = dino_detection_loss(out, gt_boxes, gt_labels, gt_valid)
        return total

    def train_step(state: TrainState, batch_inputs, img_masks, gt_boxes, gt_labels, gt_valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch_inputs, img_masks, gt_boxes, gt_labels, gt_valid
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_sharded_state(model, params, tx, mesh: Mesh) -> TrainState:
    params = shard_params(params, mesh)
    opt_state = jax.jit(
        tx.init, out_shardings=None
    )(params)
    step = jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh))
    return TrainState(params, opt_state, step)


def jit_train_step(model, tx, mesh: Mesh):
    """Sharded train step: batch over dp, params per the tp rule."""
    step = make_train_step(model, tx)
    data_sh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(None, data_sh, data_sh, data_sh, data_sh, data_sh),
        donate_argnums=(0,),
    )
