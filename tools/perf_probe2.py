"""Ablation probe: where do the U-Net forward's non-MXU milliseconds go?

Per-layer standalone timing is useless on this deployment (the remote relay
adds a ~6-12 ms floor per dispatch), so instead this times the FULL jitted
forward with specific subcomponents monkeypatched to identity. The delta vs
baseline is that component's true in-graph cost (including what XLA could or
couldn't fuse around it).

Also measures a pure chained conv3x3 stack per stage shape as the achievable
conv MFU ceiling.

Run: python tools/perf_probe2.py
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


def bench_fn(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def report(name, dt, flops=0.0, base=None):
    tf = flops / dt / 1e12 if flops else 0.0
    extra = f'  {tf:7.2f} TF/s {tf * 1e12 / PEAK_BF16 * 100:5.1f}% MFU' if flops else ''
    delta = f'  delta={1e3 * (base - dt):+8.3f} ms' if base is not None else ''
    print(f'{name:36s} {dt * 1e3:9.3f} ms{extra}{delta}', flush=True)
    return dt


def fwd_time(b=8):
    """Build + time the flagship forward with whatever patches are active."""
    import importlib
    import srgd_tpu.nn.layers
    import srgd_tpu.nn.unet
    importlib.reload(srgd_tpu.nn.unet)  # pick up patched layer classes
    from srgd_tpu.nn.unet import build_unet_from_config
    import __graft_entry__ as ge

    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
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
    try:
        fl = fwd.lower(params, x, t, x, lb).compile().cost_analysis().get('flops', 0.0)
    except Exception:
        fl = 0.0
    return bench_fn(fwd, params, x, t, x, lb), fl


class _IdentityAttn:
    """Stands in for LinearAttention/Attention: returns input unchanged."""

    def __init__(self, *a, **kw):
        pass

    def __call__(self, x):
        return x


def main():
    import srgd_tpu.nn.layers as L

    print(f'devices={jax.devices()}', flush=True)

    d0, fl = fwd_time()
    base = report('fwd baseline', d0, fl)

    orig = dict(LinearAttention=L.LinearAttention, Attention=L.Attention,
                group_norm=L.group_norm)

    # 1. linear attention -> identity
    L.LinearAttention = _IdentityAttn
    d, _ = fwd_time()
    report('fwd w/o linear attention', d, base=base)
    L.LinearAttention = orig['LinearAttention']

    # 2. full attention -> identity
    L.Attention = _IdentityAttn
    d, _ = fwd_time()
    report('fwd w/o full attention', d, base=base)
    L.Attention = orig['Attention']

    # 3. all attention -> identity
    L.LinearAttention = _IdentityAttn
    L.Attention = _IdentityAttn
    d, _ = fwd_time()
    report('fwd w/o any attention', d, base=base)
    L.LinearAttention = orig['LinearAttention']
    L.Attention = orig['Attention']

    # 4. group_norm -> passthrough (keeps FiLM+SiLU)
    L.group_norm = lambda x, s, b_, num_groups=8, eps=1e-5: x.astype(jnp.float32)
    d, _ = fwd_time()
    report('fwd w/o group_norm', d, base=base)
    L.group_norm = orig['group_norm']

    # 5. conv MFU ceiling: 16 chained conv3x3 per stage shape, one jit
    import flax.linen as nn

    for (res, ch) in [(256, 128), (128, 256), (64, 512), (32, 1024)]:
        class ConvChain(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(16):
                    x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                                name=f'c{i}')(x)
                return x

        m = ConvChain()
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (8, res, res, ch), jnp.float32).astype(jnp.bfloat16)
        p = jax.jit(m.init)(rng, x)
        f = jax.jit(m.apply)
        fl = 16 * 2 * 8 * res * res * 9 * ch * ch
        d = bench_fn(f, p, x)
        report(f'conv3x3-chain {ch}ch @{res}^2', d, fl)


if __name__ == '__main__':
    main()
