"""Round-4 probe: fused whole-block linear attention (kernels/linattn_block)
vs the XLA path, inside the full flagship forward on the real chip.

Run: python tools/perf_probe10.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_fn(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def fwd_time(b=8, quant=None):
    import __graft_entry__ as ge
    from srgd_tpu.nn.unet import build_unet_from_config
    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
    if quant:
        conf.quantize = quant
        conf.quantize_min_channels = 512
    net = build_unet_from_config(conf)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
        cond=jnp.zeros((1, 256, 256, 3)),
        class_label=jnp.zeros((1,), jnp.int32)))(rng)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x, t, c, l: net.apply(p, x, t, cond=c, class_label=l))
    x = jax.random.normal(rng, (b, 256, 256, 3), jnp.float32)
    t = jnp.zeros((b,), jnp.float32)
    lb = jnp.zeros((b,), jnp.int32)
    return bench_fn(fwd, params, x, t, x, lb)


def main():
    import srgd_tpu.nn.layers as L
    print(f'devices={jax.devices()}', flush=True)

    orig_gate = L._use_fused_linattn
    L._use_fused_linattn = lambda *a: False
    d = fwd_time()
    print(f'fwd XLA-linattn baseline     {d*1e3:8.3f} ms', flush=True)

    L._use_fused_linattn = orig_gate
    d = fwd_time()
    print(f'fwd fused-linattn            {d*1e3:8.3f} ms', flush=True)

    d = fwd_time(quant='w8a8')
    print(f'fwd fused + int8-deep        {d*1e3:8.3f} ms', flush=True)


if __name__ == '__main__':
    main()
