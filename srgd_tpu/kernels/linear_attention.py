"""Fused linear-attention kernel (Pallas, TPU).

The U-Net's high-resolution stages use linear attention
(/root/reference/model.py:287-324): q softmax over the head dim, k softmax
over the sequence, then context = k^T v and out = context^T q. XLA's lowering
materializes several f32 (N, heads*d) intermediates in HBM (~9.5 ms at
256^2 x 128 on v5e); this kernel streams k, v, q once each.

Layout trick: all 4 heads stay packed in the 128-lane channel dim
(c = head*32 + d). The sequence softmax of k is handled with a flash-style
online column max; the head-dim softmax of q subtracts the global row max
(constant within each head => mathematically identical) and gets its per-head
denominator via one MXU matmul against a block-diagonal ones matrix. The
cross-head garbage produced by full 128x128 contractions is zeroed by a
block-diagonal mask on the tiny (C x C) context matrix in XLA.

Passes:
  A (pallas): stream k, v -> stabilized column-sums s and context C = ek^T v
  B (XLA, O(C^2)): Cn = blockdiag_mask * (C / s) * head_dim^-0.5
  C (pallas): stream q -> out = softmax_head(q) @ Cn
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_kernel(k_ref, v_ref, s_ref, c_ref, m_sc):
    j = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)              # (rb, C)
    v = v_ref[0].astype(jnp.float32)
    m_blk = jnp.max(k, axis=0, keepdims=True)     # (1, C) column max

    @pl.when(j == 0)
    def _():
        m_sc[:] = m_blk
        ek = jnp.exp(k - m_blk)
        s_ref[0] = jnp.sum(ek, axis=0, keepdims=True)
        c_ref[0] = jax.lax.dot_general(
            ek, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j > 0)
    def _():
        m_old = m_sc[:]
        m_new = jnp.maximum(m_old, m_blk)
        alpha = jnp.exp(m_old - m_new)            # (1, C), rescales history
        m_sc[:] = m_new
        ek = jnp.exp(k - m_new)
        s_ref[0] = s_ref[0] * alpha + jnp.sum(ek, axis=0, keepdims=True)
        c_ref[0] = c_ref[0] * alpha.reshape(-1, 1) + jax.lax.dot_general(
            ek, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _out_kernel(q_ref, cn_ref, ones_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)              # (rb, C)
    m = jnp.max(q, axis=-1, keepdims=True)        # global row max: constant
    eq = jnp.exp(q - m)                           # within each head => exact
    denom = jax.lax.dot_general(                  # per-head sums via blockdiag
        eq, ones_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qn = eq / denom
    out = jax.lax.dot_general(
        qn, cn_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_row_block(n: int, c: int) -> int:
    rb = n
    while rb * c * 4 > 2 * 1024 * 1024 and rb % 2 == 0:
        rb //= 2
    return rb


def _head_blockdiag(c: int, dim_head: int, dtype=np.float32) -> np.ndarray:
    m = np.zeros((c, c), dtype)
    for h in range(c // dim_head):
        s = h * dim_head
        m[s:s + dim_head, s:s + dim_head] = 1.0
    return m


@functools.partial(jax.jit, static_argnames=('dim_head', 'interpret'))
def fused_linear_attention(q, k, v, dim_head: int = 32,
                           interpret: bool = False):
    """q, k, v: (B, N, C) with heads packed as c = head*dim_head + d.

    Returns (B, N, C): per-head linear attention
    out[n, e] = sum_d softmax_d(q)[n, d] * dim_head^-0.5 * context[d, e]
    context[d, e] = sum_n softmax_n(k)[n, d] * v[n, e].
    """
    b, n, c = q.shape
    rb = _pick_row_block(n, c)
    n_chunks = n // rb
    assert rb * n_chunks == n, (n, rb)

    s, ctx = pl.pallas_call(
        _kv_kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(k, v)

    # tiny (B, C, C) fold in XLA: normalize k-softmax, zero cross-head terms,
    # fold the q scale
    mask = jnp.asarray(_head_blockdiag(c, dim_head))
    cn = ctx / jnp.swapaxes(s, 1, 2)              # divide rows d by s_d
    cn = cn * mask[None] * (dim_head ** -0.5)

    ones = jnp.asarray(_head_blockdiag(c, dim_head), q.dtype)
    out = pl.pallas_call(
        _out_kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        interpret=interpret,
    )(q, cn.astype(jnp.float32), ones)
    return out


# ---------------------------------------------------------------------------
# Packed-qkv variant: no XLA q/k/v slice materializations
# ---------------------------------------------------------------------------

def _make_kv_packed_kernel(c: int):
    def kernel(qkv_ref, s_ref, c_ref, m_sc):
        j = pl.program_id(1)
        blk = qkv_ref[0]                              # (rb, 3C)
        k = blk[:, c:2 * c].astype(jnp.float32)
        v = blk[:, 2 * c:3 * c].astype(jnp.float32)
        m_blk = jnp.max(k, axis=0, keepdims=True)     # (1, C) column max

        @pl.when(j == 0)
        def _():
            m_sc[:] = m_blk
            ek = jnp.exp(k - m_blk)
            s_ref[0] = jnp.sum(ek, axis=0, keepdims=True)
            c_ref[0] = jax.lax.dot_general(
                ek, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(j > 0)
        def _():
            m_old = m_sc[:]
            m_new = jnp.maximum(m_old, m_blk)
            alpha = jnp.exp(m_old - m_new)
            m_sc[:] = m_new
            ek = jnp.exp(k - m_new)
            s_ref[0] = s_ref[0] * alpha + jnp.sum(ek, axis=0, keepdims=True)
            c_ref[0] = c_ref[0] * alpha.reshape(-1, 1) + jax.lax.dot_general(
                ek, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


def _make_out_packed_kernel(c: int):
    def kernel(qkv_ref, cn_ref, ones_ref, o_ref):
        q = qkv_ref[0][:, :c].astype(jnp.float32)
        m = jnp.max(q, axis=-1, keepdims=True)        # global row max: exact
        eq = jnp.exp(q - m)
        denom = jax.lax.dot_general(
            eq, ones_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = jax.lax.dot_general(
            eq / denom, cn_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=('dim_head', 'interpret'))
def fused_linear_attention_qkv(qkv, dim_head: int = 32,
                               interpret: bool = False):
    """qkv: (B, N, 3C) packed [q|k|v], heads packed as c = head*dim_head + d
    — exactly the to_qkv conv output, so no q/k/v slices ever materialize in
    HBM (the slices the unpacked variant forces cost more than its kernels
    save; tools/perf_probe3.py). Returns (B, N, C)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    rb = _pick_row_block(n, c3)
    n_chunks = n // rb
    assert rb * n_chunks == n, (n, rb)

    s, ctx = pl.pallas_call(
        _make_kv_packed_kernel(c),
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, rb, c3), lambda i, j: (i, j, 0))],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(qkv)

    mask = jnp.asarray(_head_blockdiag(c, dim_head))
    cn = ctx / jnp.swapaxes(s, 1, 2)
    cn = cn * mask[None] * (dim_head ** -0.5)

    out = pl.pallas_call(
        _make_out_packed_kernel(c),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rb, c3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv, cn.astype(jnp.float32), jnp.asarray(_head_blockdiag(c, dim_head),
                                               jnp.float32))
    return out
