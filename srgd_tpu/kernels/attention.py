"""Fused flash-style attention kernel (Pallas, TPU).

Replaces the XLA einsum-softmax-einsum chain in srgd_tpu.nn.layers.Attention
for the U-Net's full-attention stages (the reference's library ``Attend``,
/root/reference/model.py:326-355): online-softmax over KV blocks, so the
(N x N) similarity matrix never materializes in HBM.

Geometry here is small-N image attention: N = (tile/8)^2 tokens (1024 for
256px tiles), head dim 32. Each grid program handles one (batch x head) and a
block of N query rows; f32 accumulation in VMEM scratch.

Falls back to the XLA path on non-TPU backends (interpret=True under tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    q = q_ref[0].astype(jnp.float32) * scale            # (block_q, d)
    block_q, d = q.shape

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)   # running max
    l = jnp.zeros((block_q, 1), jnp.float32)            # running denom
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kv = kv_len // block_k

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_attention(q, k, v, interpret: bool = False):
    """q, k, v: (B, heads, N, D). Softmax(QK^T * D^-0.5) V, f32 accumulation.

    N must be a multiple of the query block (we pick gcd-friendly 256/512).
    """
    b, h, n, d = q.shape
    scale = d ** -0.5
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)

    block_q = min(512, n)
    while n % block_q:
        block_q //= 2
    block_k = min(512, n)
    while n % block_k:
        block_k //= 2

    grid = (bh, n // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=n, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
