"""Per-layer TPU timing probe for the flagship dim-128 U-Net forward.

Times the full forward at several tile-batch sizes plus standalone jits of the
component blocks at their in-network shapes, so perf work targets the actual
MFU sink instead of guesses. Run on the real TPU chip:

    python tools/perf_probe.py            # full sweep
    PROBE_PARTS=0 python tools/perf_probe.py   # forward-only

Timing rule for this deployment (CLAUDE.md): block_until_ready does not
reliably synchronize through the remote-compile relay, so every measurement
forces a scalar device->host fetch.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # TPU v5e


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


def flops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        return c.get('flops', 0.0)
    except Exception:
        return 0.0


def report(name, dt, flops):
    tf = flops / dt / 1e12 if flops else 0.0
    mfu = tf * 1e12 / PEAK_BF16 * 100
    print(f'{name:44s} {dt * 1e3:9.3f} ms  {tf:7.2f} TF/s  {mfu:5.1f}% MFU',
          flush=True)
    return tf


def main():
    from srgd_tpu.nn import layers as L
    from srgd_tpu.nn.unet import build_unet_from_config
    import __graft_entry__ as ge

    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    print(f'devices={jax.devices()}', flush=True)

    # ---- full forward at several tile-batch sizes -------------------------
    conf = ge._flagship_conf()
    conf.compute_dtype = 'bfloat16'
    net = build_unet_from_config(conf)
    params = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
        cond=jnp.zeros((1, 256, 256, 3)),
        class_label=jnp.zeros((1,), jnp.int32)))(rng)
    params = jax.tree.map(lambda a: a.astype(dt), params)

    fwd = jax.jit(lambda p, x, t, c, l: net.apply(
        p, x, t, cond=c, class_label=l))

    batches = [int(b) for b in os.environ.get('PROBE_BATCHES', '8,16,27').split(',')]
    for b in batches:
        x = jax.random.normal(jax.random.fold_in(rng, b), (b, 256, 256, 3), jnp.float32)
        t = jnp.zeros((b,), jnp.float32)
        lb = jnp.zeros((b,), jnp.int32)
        f = flops_of(fwd, params, x, t, x, lb)
        d = bench_fn(fwd, params, x, t, x, lb)
        report(f'unet_fwd b={b} 256px', d, f)

    if os.environ.get('PROBE_PARTS', '1') != '1':
        return

    # ---- component blocks at in-network shapes ----------------------------
    b = 8

    def probe_module(name, mod, shapes, flops_scale=None):
        xs = [jax.random.normal(jax.random.fold_in(rng, hash(name) % 2**31), s,
                                jnp.float32).astype(dt) for s in shapes]
        p = jax.jit(mod.init)(rng, *xs)
        f = jax.jit(mod.apply)
        fl = flops_of(f, p, *xs)
        d = bench_fn(f, p, *xs)
        report(name, d, fl)

    # stage-0 (256px, 128ch) pieces
    temb = (b, 512)
    probe_module('resblock 128->128 @256^2',
                 L.ResnetBlock(128, 128, time_emb_dim=512, dtype=dt),
                 [(b, 256, 256, 128), temb])
    probe_module('linattn 128 @256^2', L.LinearAttention(128, dtype=dt),
                 [(b, 256, 256, 128)])
    probe_module('downsample 128->128 @256^2', L.Downsample(128, dtype=dt),
                 [(b, 256, 256, 128)])

    # groupnorm alone @256^2 (the Block's norm path)
    gn = jax.jit(lambda x, s, bb: L.group_norm(x, s, bb))
    x = jax.random.normal(rng, (b, 256, 256, 128), jnp.float32).astype(dt)
    s_ = jnp.ones((128,), jnp.float32)
    b_ = jnp.zeros((128,), jnp.float32)
    d = bench_fn(gn, x, s_, b_)
    report('group_norm 128 @256^2', d, flops_of(gn, x, s_, b_))

    # plain conv3x3 @256^2 for the conv-only MFU ceiling
    import flax.linen as nn
    probe_module('conv3x3 128->128 @256^2',
                 nn.Conv(128, (3, 3), padding=1, dtype=dt),
                 [(b, 256, 256, 128)])
    probe_module('conv3x3 1024->1024 @32^2',
                 nn.Conv(1024, (3, 3), padding=1, dtype=dt),
                 [(b, 32, 32, 1024)])

    # stage-1..3 + mid pieces
    probe_module('resblock 256->256 @128^2',
                 L.ResnetBlock(256, 256, time_emb_dim=512, dtype=dt),
                 [(b, 128, 128, 256), temb])
    probe_module('resblock 1024->1024 @32^2',
                 L.ResnetBlock(1024, 1024, time_emb_dim=512, dtype=dt),
                 [(b, 32, 32, 1024), temb])
    probe_module('fullattn 1024 @32^2', L.Attention(1024, dtype=dt),
                 [(b, 32, 32, 1024)])
    probe_module('linattn 256 @128^2', L.LinearAttention(256, dtype=dt),
                 [(b, 128, 128, 256)])
    # up-path resblock has concat'd input channels
    probe_module('resblock 256->128 @256^2 (up)',
                 L.ResnetBlock(256, 128, time_emb_dim=512, dtype=dt),
                 [(b, 256, 256, 256), temb])
    probe_module('pixelshuffle_up 128->128 @128^2',
                 L.PixelShuffleUpsample(128, 128, dtype=dt),
                 [(b, 128, 128, 128)])


if __name__ == '__main__':
    main()
