"""Probe 3: does enabling the Pallas kernels fix the linattn/GN sink?

Times the full flagship forward with the use_pallas / use_pallas_attention
variants, plus numerics checks vs the XLA path.

Run: python tools/perf_probe3.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_fn(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(use_pallas=False, use_pallas_attention=False):
    from srgd_tpu.nn.unet import build_unet_from_config
    import __graft_entry__ as ge
    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
    net = build_unet_from_config(conf)
    return net.clone(use_pallas=use_pallas,
                     use_pallas_attention=use_pallas_attention)


def main():
    print(f'devices={jax.devices()}', flush=True)
    rng = jax.random.PRNGKey(0)
    b = 8
    x = jax.random.normal(rng, (b, 256, 256, 3), jnp.float32)
    t = jnp.zeros((b,), jnp.float32)
    lb = jnp.zeros((b,), jnp.int32)

    net0 = build()
    params = jax.jit(lambda k: net0.init(
        k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
        cond=jnp.zeros((1, 256, 256, 3)),
        class_label=jnp.zeros((1,), jnp.int32)))(rng)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    outs = {}
    for name, (up, upa) in [('xla', (False, False)),
                            ('pallas gn+linattn', (True, False)),
                            ('pallas all', (True, True))]:
        net = build(up, upa)
        fwd = jax.jit(lambda p, x, t, c, l, n=net: n.apply(
            p, x, t, cond=c, class_label=l))
        try:
            fl = fwd.lower(params, x, t, x, lb).compile(
                ).cost_analysis().get('flops', 0.0)
        except Exception:
            fl = 0.0
        d = bench_fn(fwd, params, x, t, x, lb)
        tf = fl / d / 1e12 if fl else 0.0
        print(f'fwd {name:20s} {d * 1e3:9.3f} ms  {tf:7.2f} TF/s  '
              f'{tf * 1e12 / PEAK_BF16 * 100:5.1f}% MFU', flush=True)
        outs[name] = np.asarray(fwd(params, x, t, x, lb), np.float32)

    ref = outs['xla']
    for name, o in outs.items():
        if name == 'xla':
            continue
        err = np.abs(o - ref).max()
        print(f'max|{name} - xla| = {err:.3e}', flush=True)


if __name__ == '__main__':
    main()
