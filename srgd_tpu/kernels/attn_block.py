"""Fused whole-block full attention (Pallas TPU).

Covers the ENTIRE Attention module in one kernel — RMSNorm -> qkv 1x1
conv -> per-head softmax(QK^T)V -> to_out 1x1 conv (reference semantics:
/root/reference/model.py:326-355 + library Attend SDPA) — with kernel
boundaries at the module's HBM materialization points, the same design
that made kernels/linattn_block.py win where the round-1 mid-chain
kernels lost.

The full-attention instances all sit at the 32x32 bottleneck (n = 1024),
so one batch element's entire working set fits VMEM and the kernel is
single-phase: grid = (b,), a static Python loop over the 4 heads, the
(n, n) similarity matrix living in scratch. Softmax in float32; MXU
operands bfloat16 with float32 accumulation (the XLA path's contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srgd_tpu.kernels.linattn_block import _rmsnorm_rows


def _kernel(x_ref, g1_ref, wqkv_ref, wout_ref, bout_ref, o_ref,
            sim_ref, *, heads: int, dim_head: int, cdtype):
    n = x_ref.shape[1]
    hidden = heads * dim_head
    scale = dim_head ** -0.5

    y = _rmsnorm_rows(x_ref[0].astype(jnp.float32), g1_ref[:]).astype(cdtype)
    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32
                  ).astype(cdtype)                      # (n, 3*hidden)

    outs = []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head]
        k = qkv[:, hidden + h * dim_head:hidden + (h + 1) * dim_head]
        v = qkv[:, 2 * hidden + h * dim_head:2 * hidden + (h + 1) * dim_head]
        sim_ref[:] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(sim_ref[:], axis=-1, keepdims=True)
        e = jnp.exp(sim_ref[:] - m)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
        outs.append(jnp.dot(attn, v, preferred_element_type=jnp.float32)
                    .astype(cdtype))
    o = jnp.concatenate(outs, axis=-1)                  # (n, hidden)
    out = jnp.dot(o, wout_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bout_ref[:]).astype(o_ref.dtype)


def _xla_attn_block(x, g1, wqkv, wout, bout, *, heads: int, dim_head: int):
    """Pure-XLA formulation of the identical whole-block math, differentiated
    by the custom VJP below (the Pallas kernel computes the same function;
    the backward recomputes from the primal inputs, remat-style)."""
    import math
    b, n, c = x.shape
    hidden = heads * dim_head
    cdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = (xf / jnp.maximum(norm, 1e-12)
         * (g1.astype(jnp.float32) * math.sqrt(c))).astype(cdtype)
    qkv = jnp.einsum('bnc,co->bno', y, wqkv.astype(cdtype),
                     preferred_element_type=jnp.float32).astype(cdtype)
    q = qkv[..., :hidden].reshape(b, n, heads, dim_head)
    k = qkv[..., hidden:2 * hidden].reshape(b, n, heads, dim_head)
    v = qkv[..., 2 * hidden:].reshape(b, n, heads, dim_head)
    sim = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                     preferred_element_type=jnp.float32) * (dim_head ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1).astype(cdtype)
    o = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                   preferred_element_type=jnp.float32).astype(cdtype)
    out = jnp.einsum('bnd,dc->bnc', o.reshape(b, n, hidden),
                     wout.astype(cdtype),
                     preferred_element_type=jnp.float32)
    return (out + bout.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_attn(heads, dim_head, interpret, x, g1, wqkv, wout, bout):
    return _pallas_forward(x, g1, wqkv, wout, bout, heads=heads,
                           dim_head=dim_head, interpret=interpret)


def _fused_attn_fwd(heads, dim_head, interpret, *args):
    return _fused_attn(heads, dim_head, interpret, *args), args


def _fused_attn_bwd(heads, dim_head, interpret, res, ct):
    _, vjp = jax.vjp(
        lambda *a: _xla_attn_block(*a, heads=heads, dim_head=dim_head), *res)
    return vjp(ct)


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


@functools.partial(jax.jit,
                   static_argnames=('heads', 'dim_head', 'interpret'))
def fused_attn_block(x, g1, wqkv, wout, bout, *, heads: int = 4,
                     dim_head: int = 32, interpret: bool = False):
    """x: (b, n, c) with n small enough for VMEM (the 32^2 bottleneck).
    g1: (c,) RMSNorm gain; wqkv: (c, 3*heads*dim_head); wout: (hidden, c);
    bout: (c,). Returns (b, n, c) = to_out(SDPA(qkv(RMSNorm(x)))) — the
    residual add stays with the caller (unet.py).

    Differentiable via the custom VJP of ``_xla_attn_block`` (same math),
    so training can keep the fused kernel on (VERDICT r2 #7)."""
    return _fused_attn(heads, dim_head, interpret, x, g1, wqkv, wout, bout)


def _pallas_forward(x, g1, wqkv, wout, bout, *, heads: int, dim_head: int,
                    interpret: bool):
    import math
    b, n, c = x.shape
    hidden = heads * dim_head
    cdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    g1s = (g1.astype(jnp.float32) * math.sqrt(c)).reshape(1, c)
    bout2 = bout.astype(jnp.float32).reshape(1, c)

    kernel = functools.partial(_kernel, heads=heads, dim_head=dim_head,
                               cdtype=cdtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, c), lambda bi: (0, 0)),
            pl.BlockSpec((c, 3 * hidden), lambda bi: (0, 0)),
            pl.BlockSpec((hidden, c), lambda bi: (0, 0)),
            pl.BlockSpec((1, c), lambda bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(x, g1s, wqkv, wout, bout2)
