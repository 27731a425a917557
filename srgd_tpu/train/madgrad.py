"""MADGRAD optimizer as an optax GradientTransformation.

The reference's config surface implies this optimizer (`optimizer: str`
plus `madgrad_decoupled_decay`, /root/reference/config.py:124,131); the
trainer itself is unreleased, so the semantics follow the published
algorithm (Defazio & Jelassi, "Adaptivity without Compromise", 2021 —
the facebookresearch/madgrad step):

    lamb_k = lr_k * sqrt(k + 1)
    decoupled decay:  p <- p * (1 - lr_k * wd)   (AdamW-style, pre-step)
    coupled decay:    g <- g + wd * p            (classic L2)
    nu  <- nu + lamb_k * g^2
    s   <- s  + lamb_k * g
    z   =  x0 - s / (cbrt(nu) + eps)
    p   <- momentum * p + (1 - momentum) * z

Unlike Adam, the learning rate enters the accumulators, so the schedule
must be passed into the transform (not chained after it); x0 is the
initial parameter snapshot. All statistics are float32.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class MadgradState(NamedTuple):
    count: jnp.ndarray   # int32 step k
    s: Any               # sum of lamb_k * g
    nu: Any              # sum of lamb_k * g^2
    x0: Any              # initial params snapshot


def madgrad(learning_rate: Union[float, Callable[[jnp.ndarray], jnp.ndarray]],
            momentum: float = 0.9,
            weight_decay: float = 0.0,
            decoupled_decay: bool = True,
            eps: float = 1e-6) -> optax.GradientTransformation:
    """MADGRAD with the torch implementation's update order: decay is
    applied to the incoming params first, then the dual averages advance
    and the momentum mix pulls p toward z."""

    def sched(count):
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        return jnp.asarray(lr, jnp.float32)

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        x0 = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), params)
        return MadgradState(count=jnp.zeros((), jnp.int32),
                            s=zeros,
                            nu=jax.tree.map(jnp.copy, zeros),
                            x0=x0)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError('madgrad requires params (pass them to update)')
        k = state.count
        lr_k = sched(k)
        lamb = lr_k * jnp.sqrt(k.astype(jnp.float32) + 1.0)
        ck = 1.0 - momentum

        def leaf(g, p, s, nu, x0):
            g = jnp.asarray(g, jnp.float32)
            pf = jnp.asarray(p, jnp.float32)
            if weight_decay:
                if decoupled_decay:
                    pf = pf * (1.0 - lr_k * weight_decay)
                else:
                    g = g + weight_decay * pf
            nu_n = nu + lamb * g * g
            s_n = s + lamb * g
            z = x0 - s_n / (jnp.cbrt(nu_n) + eps)
            p_new = momentum * pf + ck * z
            upd = (p_new - jnp.asarray(p, jnp.float32)).astype(p.dtype)
            return upd, s_n, nu_n

        flat = jax.tree.map(leaf, grads, params, state.s, state.nu, state.x0)
        updates = jax.tree.map(lambda t: t[0], flat,
                               is_leaf=lambda t: isinstance(t, tuple))
        s_new = jax.tree.map(lambda t: t[1], flat,
                             is_leaf=lambda t: isinstance(t, tuple))
        nu_new = jax.tree.map(lambda t: t[2], flat,
                              is_leaf=lambda t: isinstance(t, tuple))
        return updates, MadgradState(count=k + 1, s=s_new, nu=nu_new,
                                     x0=state.x0)

    return optax.GradientTransformation(init_fn, update_fn)
