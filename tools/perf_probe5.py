"""Probe 5: squeeze the residual non-conv overhead (~16 ms of 63 ms).

A/B on the full flagship forward:
  1. use_pallas_attention only (flash kernel for the three 32^2 full attns)
  2. linattn with DEFAULT-precision (bf16) denominator/stat matmuls instead
     of HIGHEST — trades ~1e-3 relative softmax error (bf16 mode only) for
     skipping f32 3-pass matmuls
  3. both

Run: python tools/perf_probe5.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12


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


def fwd_time(b=8, use_pallas_attention=False):
    import importlib
    import srgd_tpu.nn.unet
    importlib.reload(srgd_tpu.nn.unet)
    from srgd_tpu.nn.unet import build_unet_from_config
    import __graft_entry__ as ge

    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
    net = build_unet_from_config(conf).clone(
        use_pallas_attention=use_pallas_attention)
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
    try:
        fl = fwd.lower(params, x, t, x, lb).compile().cost_analysis().get('flops', 0.0)
    except Exception:
        fl = 0.0
    d = bench_fn(fwd, params, x, t, x, lb)
    out = np.asarray(fwd(params, x, t, x, lb), np.float32)
    return d, fl, out


def report(name, d, fl):
    tf = fl / d / 1e12 if fl else 0.0
    print(f'{name:36s} {d * 1e3:9.3f} ms  {tf:7.2f} TF/s  '
          f'{tf * 1e12 / PEAK * 100:5.1f}% MFU', flush=True)


def main():
    import srgd_tpu.nn.layers as L
    print(f'devices={jax.devices()}', flush=True)

    d, fl, out0 = fwd_time()
    report('fwd baseline', d, fl)

    d, fl, out1 = fwd_time(use_pallas_attention=True)
    report('fwd + pallas full attn', d, fl)
    print(f'  max err vs base: {np.abs(out1 - out0).max():.3e}', flush=True)

    # patch linattn precision: HIGHEST -> DEFAULT on the denominator matmul
    src_prec = jax.lax.Precision.HIGHEST

    orig_call = L.LinearAttention.__call__

    import srgd_tpu.nn.layers as layers_mod
    real_hi = jax.lax.Precision.HIGHEST

    class _FakePrecision:
        HIGHEST = jax.lax.Precision.DEFAULT
        DEFAULT = jax.lax.Precision.DEFAULT

    # group_norm + linattn read Precision.HIGHEST through jax.lax at call time
    lax_mod = jax.lax

    class _LaxProxy:
        def __getattr__(self, name):
            if name == 'Precision':
                return _FakePrecision
            return getattr(lax_mod, name)

    layers_mod.jax.lax  # ensure attribute exists

    import types
    fake_jax = types.SimpleNamespace(**{k: getattr(jax, k) for k in dir(jax)
                                        if not k.startswith('_')})
    fake_jax.lax = _LaxProxy()
    layers_mod.jax = fake_jax
    try:
        d, fl, out2 = fwd_time()
        report('fwd bf16 stat matmuls', d, fl)
        print(f'  max err vs base: {np.abs(out2 - out0).max():.3e}', flush=True)
    finally:
        layers_mod.jax = jax


if __name__ == '__main__':
    main()
