"""Probe 4: candidate layout-friendly reformulations of the linattn/GN sink.

Probe 2 showed linear attention costs ~21 ms and group_norm ~6 ms of the
~73 ms forward while convs alone sustain ~135 TF/s. Hypothesis: the cost is
layout, not math — the (b, n, heads, 32) reshapes and f32 softmax over the
sequence axis force relayouts of 256 MB tensors, and GN's (..., 8, 16)
reshape does the same.

Candidates (math identical to the shipped layers):
- LinearAttentionV2: everything stays (b, n, 128)-minor; per-head softmax
  via a global row-max shift + block-diagonal ones matmul for denominators;
  context and output as full 128x128 contractions with cross-head terms
  zeroed by a block-diagonal mask.
- group_norm_v2: per-group stats via (C x G) one-hot matmuls, broadcast back
  via (G x C); no reshape of the activation.

Run: python tools/perf_probe4.py
"""

import math
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

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


def _blockdiag(c, dim_head, dtype):
    m = np.zeros((c, c), np.float32)
    for h in range(c // dim_head):
        s = h * dim_head
        m[s:s + dim_head, s:s + dim_head] = 1.0
    return jnp.asarray(m, dtype)


class LinearAttentionV2(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: object = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from srgd_tpu.nn.layers import RMSNorm
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        y = RMSNorm(self.dim, dtype=self.dtype, name='norm')(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name='to_qkv')(y)
        qkv = qkv.reshape(b, n, 3 * hidden)
        q = qkv[..., :hidden]
        k = qkv[..., hidden:2 * hidden]
        v = qkv[..., 2 * hidden:]

        blk = _blockdiag(hidden, self.dim_head, jnp.float32)

        # q: softmax over the head dim. A global row max >= each per-head max;
        # softmax is shift-invariant within the head, so this is exact.
        qf = q.astype(jnp.float32)
        eq = jnp.exp(qf - jnp.max(qf, axis=-1, keepdims=True))
        denom = jnp.einsum('bnc,ce->bne', eq, blk,
                           preferred_element_type=jnp.float32)
        qn = (eq / denom * (self.dim_head ** -0.5)).astype(self.dtype)

        # k: softmax over the sequence axis, per channel
        kf = k.astype(jnp.float32)
        ek = jnp.exp(kf - jnp.max(kf, axis=1, keepdims=True))
        kn = (ek / jnp.sum(ek, axis=1, keepdims=True)).astype(self.dtype)

        # context[d, e] = sum_n kn[n, d] v[n, e], cross-head terms masked
        ctx = jnp.einsum('bnd,bne->bde', kn, v.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        ctx = (ctx * blk[None]).astype(self.dtype)
        out = jnp.einsum('bnd,bde->bne', qn, ctx,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name='to_out')(out)
        return RMSNorm(self.dim, dtype=self.dtype, name='out_norm')(out)


def group_norm_v2(x, scale, bias, num_groups: int = 8, eps: float = 1e-5):
    b, h, w, c = x.shape
    cg = c // num_groups
    onehot = jnp.asarray(np.kron(np.eye(num_groups), np.ones((cg, 1))),
                         jnp.float32)                      # (C, G)
    xf = x.astype(jnp.float32)
    s1 = jnp.einsum('bhwc,cg->bg', xf, onehot,
                    preferred_element_type=jnp.float32)
    s2 = jnp.einsum('bhwc,cg->bg', xf * xf, onehot,
                    preferred_element_type=jnp.float32)
    cnt = float(h * w * cg)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.einsum('bg,cg->bc', inv, onehot)           # (B, C)
    mean_c = jnp.einsum('bg,cg->bc', mean, onehot)
    sc = inv_c * scale.astype(jnp.float32)[None]
    sh = bias.astype(jnp.float32)[None] - mean_c * sc
    return xf * sc[:, None, None, :] + sh[:, None, None, :]


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
    print(f'{name:28s} {d * 1e3:9.3f} ms  {tf:7.2f} TF/s  '
          f'{tf * 1e12 / PEAK_BF16 * 100:5.1f}% MFU', flush=True)


def main():
    import srgd_tpu.nn.layers as L
    print(f'devices={jax.devices()}', flush=True)

    # numerics first (CPU-cheap shapes, f32): V2 must match V1
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 64), jnp.float32)
    m1 = L.LinearAttention(64, dtype=jnp.float32)
    m2 = LinearAttentionV2(64, dtype=jnp.float32)
    p = m1.init(rng, x)
    o1 = m1.apply(p, x)
    o2 = m2.apply(p, x)
    print(f'linattn v2 max err (f32): {float(jnp.abs(o1 - o2).max()):.3e}',
          flush=True)
    g = jax.random.normal(jax.random.PRNGKey(1), (64,))
    bb = jax.random.normal(jax.random.PRNGKey(2), (64,))
    g1 = L.group_norm(x, g, bb)
    g2 = group_norm_v2(x, g, bb)
    print(f'group_norm v2 max err (f32): {float(jnp.abs(g1 - g2).max()):.3e}',
          flush=True)

    orig = dict(LinearAttention=L.LinearAttention, group_norm=L.group_norm)

    d, fl, out0 = fwd_time()
    report('fwd baseline', d, fl)

    L.LinearAttention = LinearAttentionV2
    d, fl, out1 = fwd_time()
    report('fwd linattn v2', d, fl)
    L.LinearAttention = orig['LinearAttention']

    L.group_norm = group_norm_v2
    d, fl, out2 = fwd_time()
    report('fwd gn v2', d, fl)

    L.LinearAttention = LinearAttentionV2
    d, fl, out3 = fwd_time()
    report('fwd linattn+gn v2', d, fl)

    for name, o in [('linattn v2', out1), ('gn v2', out2), ('both v2', out3)]:
        print(f'fwd max|{name} - base| = {np.abs(o - out0).max():.3e}',
              flush=True)


if __name__ == '__main__':
    main()
