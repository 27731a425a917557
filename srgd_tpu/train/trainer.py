"""Training loop pieces: optimizer, LR schedule, train state, jittable step.

The reference ships no trainer; these implement the training surface its
config and loss code imply (SURVEY.md sections 3.4, 5.4): AdamW + cosine
schedule with warmup (conf yaml:4-7), EMA decay 0.9999 (yaml:9), cond/class
dropout 0.1 handled inside the family losses, checkpointing of the EMA shadow.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from srgd_tpu.config import Config
from srgd_tpu.train.ema import ema_update


SCHEDULERS = ('cosine', 'CosineAnnealingLR', 'WarmupLinear',
              'ReduceLROnPlateau', 'constant')


def make_lr_schedule(conf: Config, steps_per_epoch: int):
    """The reference's scheduler surface (config.py:152): timm-style cosine
    with linear warmup, torch CosineAnnealingLR (no warmup), WarmupLinear,
    ReduceLROnPlateau (handled in make_optimizer as an optax transform —
    here it gets the constant base lr), plus 'constant'."""
    warmup = conf.warmup_epochs * steps_per_epoch
    total = conf.epochs * steps_per_epoch
    if conf.scheduler == 'cosine':
        return optax.warmup_cosine_decay_schedule(
            init_value=conf.warmup_lr_init, peak_value=conf.lr,
            warmup_steps=max(warmup, 1), decay_steps=max(total, 2),
            end_value=conf.min_lr)
    if conf.scheduler == 'CosineAnnealingLR':
        return optax.cosine_decay_schedule(
            init_value=conf.lr, decay_steps=max(total, 2),
            alpha=conf.min_lr / conf.lr)
    if conf.scheduler == 'WarmupLinear':
        return optax.join_schedules([
            optax.linear_schedule(conf.warmup_lr_init, conf.lr,
                                  max(warmup, 1)),
            optax.linear_schedule(conf.lr, conf.min_lr,
                                  max(total - warmup, 1)),
        ], [max(warmup, 1)])
    if conf.scheduler in ('ReduceLROnPlateau', 'constant'):
        return optax.constant_schedule(conf.lr)
    raise ValueError(f'unknown scheduler {conf.scheduler!r}; '
                     f'supported: {SCHEDULERS}')


def _maybe_epoch_quantize(sched, conf: Config, steps_per_epoch: int):
    """cosine_interval_type: 'epoch' updates the LR once per epoch
    (config.py:153); 'step' (default) updates every step."""
    if conf.cosine_interval_type == 'step':
        return sched
    if conf.cosine_interval_type == 'epoch':
        spe = max(steps_per_epoch, 1)
        return lambda count: sched((count // spe) * spe)
    raise ValueError(
        f'unknown cosine_interval_type {conf.cosine_interval_type!r}')


def make_optimizer(conf: Config, steps_per_epoch: int = 1000):
    """Returns a GradientTransformationExtraArgs; the train step passes
    value=loss so ReduceLROnPlateau (optax.contrib) can key off it."""
    sched = _maybe_epoch_quantize(make_lr_schedule(conf, steps_per_epoch),
                                  conf, steps_per_epoch)
    if conf.optimizer == 'adamw':
        if conf.amsgrad:  # torch AdamW(amsgrad=True) semantics
            tx = optax.chain(optax.scale_by_amsgrad(),
                             optax.add_decayed_weights(conf.weight_decay),
                             optax.scale_by_learning_rate(sched))
        else:
            tx = optax.adamw(sched, weight_decay=conf.weight_decay)
    elif conf.optimizer == 'adam':
        tx = (optax.amsgrad(sched) if conf.amsgrad else optax.adam(sched))
    elif conf.optimizer == 'sgd':
        tx = optax.sgd(sched, momentum=conf.momentum, nesterov=conf.nesterov)
    elif conf.optimizer == 'madgrad':
        from srgd_tpu.train.madgrad import madgrad
        tx = madgrad(sched, momentum=conf.momentum,
                     weight_decay=conf.weight_decay,
                     decoupled_decay=conf.madgrad_decoupled_decay)
    else:
        raise ValueError(f'unknown optimizer {conf.optimizer}')
    if conf.scheduler == 'ReduceLROnPlateau':
        if conf.plateau_mode != 'min':
            # the train step feeds value=loss (lower is better); 'max' would
            # need a metric plumbed in instead — reject rather than ignore
            raise ValueError(
                f"plateau_mode {conf.plateau_mode!r} unsupported: the plateau "
                "scheduler keys off the training loss ('min')")
        tx = optax.chain(tx, optax.contrib.reduce_on_plateau(
            factor=conf.factor, patience=conf.patience, atol=conf.plateau_eps))
    return optax.with_extra_args_support(tx)


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
        if hr.dtype == jnp.uint8:      # normalize on-device: the host ships
            hr = hr.astype(jnp.float32) / 255.0      # uint8 to quarter the
        if lr_cond.dtype == jnp.uint8:               # relay transfer bytes
            lr_cond = lr_cond.astype(jnp.float32) / 255.0
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, rng, hr, lr_cond, label if conditional else None)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params, value=loss)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, ema_decay)
        return state.replace(params=params, opt_state=opt_state,
                             ema_params=ema, step=state.step + 1), loss

    return step
