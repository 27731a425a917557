"""Probe 6: bf16 exp intermediates in linear attention.

Current linattn computes eq = exp(q - max) and ek = exp(k - colmax) in f32;
the einsum operands are cast to bf16 anyway (DEFAULT precision). Storing the
exps in bf16 halves their HBM traffic where XLA materializes them.

A/B on the full flagship forward with LinearAttention.__call__ patched.

Run: python tools/perf_probe6.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

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


class LinearAttentionBF16Exp(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: object = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from srgd_tpu.nn.layers import RMSNorm, _head_blockdiag
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        y = RMSNorm(self.dim, dtype=self.dtype, name='norm')(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name='to_qkv')(y)
        blk = _head_blockdiag(hidden, self.dim_head)

        qkv = qkv.reshape(b, n, 3 * hidden)
        q = qkv[..., :hidden].astype(jnp.float32)
        k = qkv[..., hidden:2 * hidden].astype(jnp.float32)
        v = qkv[..., 2 * hidden:].astype(self.dtype)

        eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True)).astype(self.dtype)
        denom = jnp.einsum('bnc,ce->bne', eq, blk.astype(self.dtype),
                           preferred_element_type=jnp.float32)
        qn = (eq.astype(jnp.float32) / denom
              * (self.dim_head ** -0.5)).astype(self.dtype)

        ek = jnp.exp(k - jnp.max(k, axis=1, keepdims=True)).astype(self.dtype)
        s = jnp.sum(ek.astype(jnp.float32), axis=1, keepdims=True)
        kn = (ek.astype(jnp.float32) / s).astype(self.dtype)

        context = jnp.einsum('bnd,bne->bde', kn, v,
                             preferred_element_type=jnp.float32)
        context = (context * blk[None]).astype(self.dtype)
        out = jnp.einsum('bnd,bde->bne', qn, context,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name='to_out')(out)
        return RMSNorm(self.dim, dtype=self.dtype, name='out_norm')(out)


def fwd_time(b=8):
    import importlib
    import srgd_tpu.nn.unet
    importlib.reload(srgd_tpu.nn.unet)
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
    d = bench_fn(fwd, params, x, t, x, lb)
    out = np.asarray(fwd(params, x, t, x, lb), np.float32)
    return d, fl, out


def report(name, d, fl):
    tf = fl / d / 1e12 if fl else 0.0
    print(f'{name:32s} {d * 1e3:9.3f} ms  {tf:7.2f} TF/s  '
          f'{tf * 1e12 / PEAK * 100:5.1f}% MFU', flush=True)


def main():
    import srgd_tpu.nn.layers as L
    print(f'devices={jax.devices()}', flush=True)

    d, fl, out0 = fwd_time()
    report('fwd baseline', d, fl)

    orig = L.LinearAttention
    L.LinearAttention = LinearAttentionBF16Exp
    try:
        d, fl, out1 = fwd_time()
        report('fwd bf16-exp linattn', d, fl)
        print(f'  max err vs base: {np.abs(out1 - out0).max():.3e}', flush=True)
    finally:
        L.LinearAttention = orig


if __name__ == '__main__':
    main()
