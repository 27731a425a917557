"""Probe 8: multi-image batched sampling vs sequential (the serving win).

A single small image underfills the tile minibatch: a 128px-LR request
(512px output, 768px padded canvas) has 9 aligned / 4 shifted tiles, so at
chunk 8 every even step runs a ragged 2-chunk dispatch and every odd step
a padded 4-of-8 chunk. Coalescing B such requests into one (B, H, W, C)
canvas pools B x tiles into full chunks.

Measures per-image sampling time for B=1 vs B=4 at 128px LR on the real
chip (bf16, host-loop, N steps). Run: python tools/perf_probe8.py
(env: P8_LR=128, P8_STEPS=8, P8_BATCH_IMAGES=4, P8_QUANT=)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    lr = int(os.environ.get('P8_LR', 128))
    steps = int(os.environ.get('P8_STEPS', 8))
    nimg = int(os.environ.get('P8_BATCH_IMAGES', 4))
    quant = os.environ.get('P8_QUANT', '')

    import __graft_entry__ as ge
    from srgd_tpu.factory import build_wrapper
    from srgd_tpu.nn.unet import build_unet_from_config

    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
    if quant:
        conf.quantize = 'w8a8'
    net = build_unet_from_config(conf)
    wrapper = build_wrapper(conf, net)
    params = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
        cond=jnp.zeros((1, 256, 256, 3)),
        class_label=jnp.zeros((1,), jnp.int32)))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    hr = lr * 4
    rng = jax.random.PRNGKey(71)

    def run(b):
        cond = jax.random.uniform(jax.random.PRNGKey(1), (b, hr, hr, 3),
                                  jnp.float32)
        label = jnp.zeros((b,), jnp.int32)
        out = wrapper.tiled_sample(params, rng, cond, label, batch_size=8,
                                   tile_size=256, num_sample_steps=steps,
                                   host_loop=True)
        float(out[0, 0, 0, 0])  # sync through the relay
        return out

    for b in (1, nimg):
        run(b)                       # compile + first
        t0 = time.time()
        run(b)
        dt = time.time() - t0
        mpix = b * hr * hr / 1e6
        print(f'B={b}: {dt:6.2f}s for {b} image(s) @ {steps} steps '
              f'-> {dt / b:6.2f}s/image, {mpix / dt * (steps / 250):.4f} '
              f'MPix/s/chip at 250-step cost')


if __name__ == '__main__':
    main()
