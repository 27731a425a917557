"""Probe 7: does int8 hit ~2x over bf16 on the v5e MXU for our conv shapes?

v5e peak: 197 TF/s bf16, 394 TOP/s int8. If XLA maps s8xs8->s32
conv_general_dilated onto the int8 MXU path, a conv3x3 chain should run
~2x the bf16 rate; the probe also models the real per-layer requantization
cost (dynamic per-tensor amax + round + clip between layers, per-channel
weight scales folded into the epilogue) so the measured ratio is what a
W8A8 U-Net conv path would actually see.

Shapes probed: the dim-128 flagship hot spots (stage-0 256px x 128ch and
mid 32px x 1024ch) at tile batch 8.

Run:  python tools/perf_probe7.py          (real TPU via the axon relay)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

LAYERS = 8


def sync(x):
    # device->host scalar fetch: block_until_ready is unreliable through the
    # remote relay (CLAUDE.md)
    return float(jnp.ravel(x)[0])


def bench(fn, args, n=20):
    out = fn(*args)
    sync(out)  # compile + first
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def conv_chain_bf16(x, ws):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.silu(x)
    return x


def conv_chain_int8(x, wqs, wscales):
    # weights pre-quantized (per-out-channel scales); activations dynamically
    # quantized per tensor each layer — the honest W8A8 pipeline
    for wq, ws in zip(wqs, wscales):
        amax = jnp.max(jnp.abs(x))
        s_x = amax / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        x = (acc.astype(jnp.float32) * (s_x * ws)).astype(jnp.bfloat16)
        x = jax.nn.silu(x)
    return x


def run_shape(tag, b, hw, c):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (3, 3, c, c),
                            jnp.bfloat16) * 0.05
          for i in range(LAYERS)]

    # per-out-channel weight quantization
    wqs, wscales = [], []
    for w in ws:
        wf = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 + 1e-12
        wqs.append(jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8))
        wscales.append(s)

    flops = 2.0 * LAYERS * b * hw * hw * 9 * c * c

    f_bf16 = jax.jit(conv_chain_bf16)
    t_bf16 = bench(f_bf16, (x, ws))

    try:
        f_int8 = jax.jit(conv_chain_int8)
        t_int8 = bench(f_int8, (x, wqs, wscales))
    except Exception as e:  # int8 conv unsupported -> report and bail
        print(f'{tag}: int8 conv failed: {type(e).__name__}: {e}')
        t_int8 = None

    print(f'{tag}: bf16 {t_bf16*1e3:7.2f} ms ({flops/t_bf16/1e12:6.1f} TF/s)',
          end='')
    if t_int8:
        print(f' | int8 {t_int8*1e3:7.2f} ms ({flops/t_int8/1e12:6.1f} TOP/s)'
              f' | ratio {t_bf16/t_int8:5.2f}x')
    else:
        print()


def main():
    print(f'devices: {jax.devices()}')
    run_shape('stage0 b8 256px 128ch', 8, 256, 128)
    run_shape('stage1 b8 128px 256ch', 8, 128, 256)
    run_shape('mid    b8  32px 1024ch', 8, 32, 1024)


if __name__ == '__main__':
    main()
