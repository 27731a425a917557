"""Probe 9: flagship-scale training-step cost on one v5e chip.

The reference's (unreleased) trainer ran dim-128 at 256px, batch 16
(conf yaml:27). This measures our jitted train step (fwd + bwd + AdamW +
EMA) at that shape on the real chip — evidence that the training capability
is usable at flagship scale, and where the memory line is.

Run: python tools/perf_probe9.py
Env: P9_BATCHES ('8,16'), P9_REMAT ('' or '1'), P9_DTYPE (bfloat16).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batches = [int(b) for b in os.environ.get('P9_BATCHES', '8,16').split(',')]
    remat = bool(os.environ.get('P9_REMAT', ''))
    dtype = os.environ.get('P9_DTYPE', 'bfloat16')

    import __graft_entry__ as ge
    from srgd_tpu.factory import build_wrapper
    from srgd_tpu.nn.unet import build_unet_from_config
    from srgd_tpu.train.trainer import (
        create_train_state, make_optimizer, make_train_step)

    conf = ge._flagship_conf()
    conf.compute_dtype = dtype
    conf.remat_unet = remat
    conf.epochs, conf.warmup_epochs = 300, 30
    net = build_unet_from_config(conf)
    wrapper = build_wrapper(conf, net)

    params = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
        cond=jnp.zeros((1, 256, 256, 3)),
        class_label=jnp.zeros((1,), jnp.int32)))(jax.random.PRNGKey(0))
    optimizer = make_optimizer(conf, steps_per_epoch=1000)
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(wrapper, optimizer, ema_decay=0.9999,
                                   conditional=True))

    for b in batches:
        rng = jax.random.PRNGKey(1)
        hr = jax.random.uniform(jax.random.PRNGKey(2), (b, 256, 256, 3))
        lr = jax.random.uniform(jax.random.PRNGKey(3), (b, 256, 256, 3))
        label = jnp.zeros((b,), jnp.int32)
        try:
            state2, loss = step(state, rng, hr, lr, label)
            float(loss)  # sync through the relay
            t0 = time.time()
            n = 10
            for _ in range(n):
                state2, loss = step(state2, rng, hr, lr, label)
            float(loss)
            dt = (time.time() - t0) / n
            print(f'b={b:3d} remat={int(remat)} {dtype}: {dt*1e3:7.1f} ms/step '
                  f'({b/dt:6.1f} img/s; epoch of 104k crops in '
                  f'{104000/ (b/dt) / 60:.1f} min)')
            del state2
        except Exception as e:
            print(f'b={b:3d} remat={int(remat)}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
