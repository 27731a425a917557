"""Fused GroupNorm + FiLM + SiLU kernels (Pallas, TPU).

The U-Net's Block runs conv -> GroupNorm(8) -> x*(scale+1)+shift -> SiLU
(/root/reference/model.py:243-259). XLA's lowering round-trips the activation
through HBM in f32 between the reduction and the normalize; here it's two
bf16-streaming Pallas passes:

1. stats: sequential grid over (batch, row-chunks) accumulating per-channel
   sum/sumsq into a (B, 2, C) f32 output (TPU grids iterate sequentially, so
   revisiting the same output block is a legal reduction pattern);
2. normalize: elementwise pass applying a per-(batch, channel) fused
   scale/shift + SiLU.

The group-folding of the per-channel stats (a (B, 2, C) -> (B, 2, C) fold with
GN affine and FiLM merged into one multiply-add) happens in XLA between the
two calls — it is O(B*C) and Mosaic cannot lane-reshape (C,) -> (groups, C/g).

Numerics match srgd_tpu.nn.layers.group_norm (f32 stats, eps 1e-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, o_ref):
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)            # (row_block, C)
    s = jnp.sum(x, axis=0)
    ss = jnp.sum(x * x, axis=0)
    block = jnp.stack([s, ss], axis=0)          # (2, C)

    @pl.when(j == 0)
    def _():
        o_ref[0] = block

    @pl.when(j > 0)
    def _():
        o_ref[0] = o_ref[0] + block


def _scale_shift_silu_kernel(x_ref, ss_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    y = x * ss_ref[0, 0] + ss_ref[0, 1]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _pick_row_block(rows: int, c: int) -> int:
    row_block = rows
    while row_block * c * 4 > 2 * 1024 * 1024 and row_block % 2 == 0:
        row_block //= 2
    return row_block


@functools.partial(jax.jit, static_argnames=('groups', 'eps', 'interpret'))
def fused_groupnorm_silu(x, gamma, beta, film=None, groups: int = 8,
                         eps: float = 1e-5, interpret: bool = False):
    """x: (B, H, W, C); gamma/beta: (C,); film: optional (B, 2, C) with
    [:, 0]=FiLM scale, [:, 1]=FiLM shift. Returns SiLU(GN(x)*(fs+1)+fb)."""
    b, h, w, c = x.shape
    rows = h * w
    cg = c // groups
    xf = x.reshape(b, rows, c)
    row_block = _pick_row_block(rows, c)
    n_chunks = rows // row_block

    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, row_block, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xf)

    # fold channel stats -> group stats -> fused per-channel scale/shift (XLA;
    # O(B*C) work)
    n_per_group = float(rows * cg)
    gsum = jnp.sum(stats[:, 0].reshape(b, groups, cg), axis=2)
    gsumsq = jnp.sum(stats[:, 1].reshape(b, groups, cg), axis=2)
    mean = gsum / n_per_group
    var = gsumsq / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)               # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    scale_eff = inv_c * gamma[None].astype(jnp.float32)
    shift_eff = beta[None].astype(jnp.float32) - mean_c * scale_eff
    if film is not None:
        fs = film[:, 0].astype(jnp.float32)
        fb = film[:, 1].astype(jnp.float32)
        scale_eff = scale_eff * (fs + 1.0)
        shift_eff = shift_eff * (fs + 1.0) + fb
    ss = jnp.stack([scale_eff, shift_eff], axis=1)      # (B, 2, C) f32

    out = pl.pallas_call(
        _scale_shift_silu_kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, row_block, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_block, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        interpret=interpret,
    )(xf, ss)
    return out.reshape(b, h, w, c)
