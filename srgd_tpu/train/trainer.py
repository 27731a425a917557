"""Training loop pieces: optimizer, LR schedule, train state, jittable step.

The reference ships no trainer; these implement the training surface its
config and loss code imply (SURVEY.md sections 3.4, 5.4): AdamW + cosine
schedule with warmup (conf yaml:4-7), EMA decay 0.9999 (yaml:9), cond/class
dropout 0.1 handled inside the family losses, checkpointing of the EMA shadow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from srgd_tpu.config import Config
from srgd_tpu.train.ema import ema_update


def make_lr_schedule(conf: Config, steps_per_epoch: int):
    """cosine with linear warmup; parity with the timm CosineLRScheduler
    settings the config implies (scheduler: cosine, warmup_epochs, min_lr)."""
    warmup = conf.warmup_epochs * steps_per_epoch
    total = conf.epochs * steps_per_epoch
    if conf.scheduler == 'cosine':
        return optax.warmup_cosine_decay_schedule(
            init_value=conf.warmup_lr_init, peak_value=conf.lr,
            warmup_steps=max(warmup, 1), decay_steps=max(total, 2),
            end_value=conf.min_lr)
    return optax.constant_schedule(conf.lr)


def make_optimizer(conf: Config, steps_per_epoch: int = 1000):
    sched = make_lr_schedule(conf, steps_per_epoch)
    if conf.optimizer == 'adamw':
        return optax.adamw(sched, weight_decay=conf.weight_decay)
    if conf.optimizer == 'adam':
        return optax.adam(sched)
    if conf.optimizer == 'sgd':
        return optax.sgd(sched, momentum=conf.momentum, nesterov=conf.nesterov)
    raise ValueError(f'unknown optimizer {conf.optimizer}')


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      ema_params=jax.tree.map(lambda x: x, params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(wrapper, optimizer, ema_decay: float, conditional: bool):
    """Returns a pure jittable step:
    (state, rng, hr, lr_cond[, label]) -> (state, loss)."""

    def loss_fn(params, rng, hr, lr_cond, label):
        return wrapper.loss(params, rng, hr, lr_cond, label)

    def step(state: TrainState, rng, hr, lr_cond, label=None):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, rng, hr, lr_cond, label if conditional else None)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, ema_decay)
        return state.replace(params=params, opt_state=opt_state,
                             ema_params=ema, step=state.step + 1), loss

    return step
