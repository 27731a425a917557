"""Fused GroupNorm + FiLM + SiLU kernels (Pallas, TPU).

The U-Net's Block runs conv -> GroupNorm(8) -> x*(scale+1)+shift -> SiLU
(/root/reference/model.py:243-259). Here it's two Pallas passes:

1. stats: sequential grid over (batch, row-chunks) accumulating per-channel
   sum/sumsq into a (B, 2, C) output (TPU grids iterate sequentially, so
   revisiting the same output block is a legal reduction pattern);
2. normalize: elementwise chunked pass applying the folded
   scale/shift (GN affine + FiLM merged into one multiply-add) and SiLU.

Numerics match srgd_tpu.nn.layers.group_norm (f32 stats, eps 1e-5). VMEM per
block is bounded by the row-chunk size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _norm_kernel(x_ref, stats_ref, gamma_ref, beta_ref, film_ref, o_ref, *,
                 groups, eps, n_per_group, use_film):
    c = x_ref.shape[-1]
    cg = c // groups
    stats = stats_ref[0]                        # (2, C) f32
    gs = jnp.sum(stats[0].reshape(groups, cg), axis=1)
    gss = jnp.sum(stats[1].reshape(groups, cg), axis=1)
    mean = gs / n_per_group
    var = gss / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    mean_c = jnp.repeat(mean, cg)
    inv_c = jnp.repeat(inv, cg)
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    scale_eff = inv_c * gamma
    shift_eff = beta - mean_c * scale_eff
    if use_film:
        fs = film_ref[0, 0].astype(jnp.float32)
        fb = film_ref[0, 1].astype(jnp.float32)
        scale_eff = scale_eff * (fs + 1.0)
        shift_eff = shift_eff * (fs + 1.0) + fb

    x = x_ref[0].astype(jnp.float32)
    y = x * scale_eff + shift_eff
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

    use_film = film is not None
    if film is None:
        film = jnp.zeros((b, 2, c), x.dtype)
    gamma_b = jnp.broadcast_to(gamma[None], (b, c))
    beta_b = jnp.broadcast_to(beta[None], (b, c))

    out = pl.pallas_call(
        functools.partial(_norm_kernel, groups=groups, eps=eps,
                          n_per_group=float(rows * (c // groups)),
                          use_film=use_film),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, row_block, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_block, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        interpret=interpret,
    )(xf, stats, gamma_b, beta_b, film)
    return out.reshape(b, h, w, c)
