"""U-Net building blocks (Flax linen, NHWC, TPU-native).

Each block reimplements the math of its reference counterpart
(/root/reference/model.py:70-355) from the formulas, reshaped for TPU:
NHWC layout (channel-last feeds the MXU's 128-lane minor dimension), optional
bfloat16 compute with float32 normalization statistics, and module/parameter
naming chosen so the torch->flax checkpoint converter is a mechanical key map
(see srgd_tpu/checkpoint/torch_convert.py).

Channel-order contracts that matter for checkpoint parity:
- pixel-shuffle: torch PixelShuffle(2) reads channel o = c*4 + dy*2 + dx
- space-to-depth: torch Rearrange 'b c (h p1) (w p2) -> b (c p1 p2) h w'
  writes channel o = c*4 + p1*2 + p2
- multi-head qkv: torch 'b (h c) x y' packs channels head-major
All three are reproduced exactly below so converted conv kernels line up.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from srgd_tpu.nn.quant import conv as _conv

Dtype = Any


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

class RMSNorm(nn.Module):
    """Channel RMS norm: x / max(||x||_2, 1e-12) * g * sqrt(C).

    Parity: /root/reference/model.py:201-207 (F.normalize over dim=1 with the
    torch default eps=1e-12). Stats in float32 regardless of compute dtype.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param('g', nn.initializers.ones, (self.dim,), jnp.float32)
        xf = _f32(x)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        out = xf / jnp.maximum(norm, 1e-12) * g * math.sqrt(self.dim)
        return out.astype(self.dtype)


def _group_onehot(c: int, num_groups: int) -> jnp.ndarray:
    """(C, G) one-hot: channel c belongs to group c // (C/G)."""
    import numpy as np
    return jnp.asarray(np.kron(np.eye(num_groups, dtype=np.float32),
                               np.ones((c // num_groups, 1), np.float32)))


def group_norm(x, scale, bias, num_groups: int = 8, eps: float = 1e-5):
    """GroupNorm over NHWC in float32, matching torch nn.GroupNorm semantics
    (normalize over spatial x channels-within-group).

    TPU layout note: group stats come from one-hot matmuls over the intact
    (..., C) minor dim instead of a reshape to (..., G, C/G) — the tiny-minor
    reshape forces relayouts of the whole activation on TPU (measured ~6 ms
    of a 73 ms dim-128 forward; tools/perf_probe2.py). For float32 inputs
    the stats matmuls run at Precision.HIGHEST so f32 fidelity survives the
    TPU's default-bf16 matmul units; bf16 inputs carry no extra mantissa to
    protect and DEFAULT is measurably faster (tools/perf_probe5.py)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    onehot = _group_onehot(c, num_groups)
    xf = _f32(x)
    hi = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
          else jax.lax.Precision.HIGHEST)
    s1 = jnp.einsum('bhwc,cg->bg', xf, onehot, precision=hi)
    s2 = jnp.einsum('bhwc,cg->bg', xf * xf, onehot, precision=hi)
    cnt = float(h * w * cg)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
    inv_c = jnp.repeat(inv, cg, axis=1)[:, None, None, :]
    return (xf - mean_c) * inv_c * _f32(scale) + _f32(bias)


# ---------------------------------------------------------------------------
# Time / class embeddings
# ---------------------------------------------------------------------------

class SinusoidalPosEmb(nn.Module):
    """Parity: /root/reference/model.py:209-221."""

    dim: int

    def __call__(self, x):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = _f32(x)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Random-or-learned sinusoidal embedding, output dim = dim + 1.

    Parity: /root/reference/model.py:223-238; output is [x, sin(2pi x w), cos(...)].
    Torch parameter name: ``weights``.
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        half_dim = self.dim // 2
        weights = self.param('weights', nn.initializers.normal(stddev=1.0),
                             (half_dim,), jnp.float32)
        x = _f32(x)[:, None]
        freqs = x * weights[None, :] * (2 * math.pi)
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeMLP(nn.Module):
    """sinu_pos_emb -> Dense -> GELU(exact) -> Dense.

    Parity: /root/reference/model.py:424-429 (torch GELU is the exact erf form).
    Torch Sequential indices 0/1/3 map to pos_emb/fc1/fc2.
    """

    dim: int                      # base unet dim
    time_dim: int
    learned_sinusoidal: bool
    learned_sinusoidal_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        if self.learned_sinusoidal:
            emb = LearnedSinusoidalPosEmb(self.learned_sinusoidal_dim, name='pos_emb')(t)
        else:
            emb = SinusoidalPosEmb(self.dim, name='pos_emb')(t)
        emb = nn.Dense(self.time_dim, dtype=jnp.float32, name='fc1')(emb)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.time_dim, dtype=jnp.float32, name='fc2')(emb)
        return emb


class ClassMLP(nn.Module):
    """Embedding -> Dense -> GELU(exact) -> Dense, added to the time embedding.

    Parity: /root/reference/model.py:612-619 (torch Sequential 0/1/3).
    """

    num_classes: int
    dim: int
    time_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, label):
        emb = nn.Embed(self.num_classes, self.dim, dtype=jnp.float32, name='emb')(label)
        emb = nn.Dense(self.time_dim, dtype=jnp.float32, name='fc1')(emb)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.time_dim, dtype=jnp.float32, name='fc2')(emb)
        return emb


# ---------------------------------------------------------------------------
# Conv blocks
# ---------------------------------------------------------------------------

class Block(nn.Module):
    """conv3x3 -> GroupNorm(8) -> optional FiLM (x*(scale+1)+shift) -> SiLU.

    Parity: /root/reference/model.py:243-259.
    """

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = _conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                  quant=self.quant, name='proj')(x)
        scale = self.param('norm_scale', nn.initializers.ones, (self.dim_out,), jnp.float32)
        bias = self.param('norm_bias', nn.initializers.zeros, (self.dim_out,), jnp.float32)
        if self.use_pallas:
            from srgd_tpu.kernels.groupnorm_silu import fused_groupnorm_silu
            film = None
            if scale_shift is not None:
                s, sh = scale_shift
                film = jnp.stack([s[:, 0, 0, :], sh[:, 0, 0, :]], axis=1)
            return fused_groupnorm_silu(x, scale, bias, film,
                                        groups=self.groups).astype(self.dtype)
        x = group_norm(x, scale, bias, num_groups=self.groups)
        if scale_shift is not None:
            s, sh = scale_shift
            x = x * (_f32(s) + 1) + _f32(sh)
        x = jax.nn.silu(x)
        return x.astype(self.dtype)


class ResnetBlock(nn.Module):
    """Two FiLM'd blocks + 1x1 residual conv.

    Parity: /root/reference/model.py:261-285. The time MLP is SiLU -> Dense
    (torch key mlp.1); scale/shift is a channel-split with scale first.
    """

    dim: int
    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            t = nn.Dense(self.dim_out * 2, dtype=jnp.float32, name='mlp')(
                jax.nn.silu(_f32(time_emb)))
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype,
                  use_pallas=self.use_pallas, quant=self.quant, name='block1')(
            x, scale_shift=scale_shift)
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype,
                  use_pallas=self.use_pallas, quant=self.quant, name='block2')(h)

        if self.dim != self.dim_out:
            res = _conv(self.dim_out, (1, 1), dtype=self.dtype,
                        quant=self.quant, name='res_conv')(x)
        else:
            res = x
        return h + res


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def _head_blockdiag(c: int, dim_head: int) -> jnp.ndarray:
    """(C, C) block-diagonal ones, one block per head."""
    import numpy as np
    eye = np.eye(c // dim_head, dtype=np.float32)
    return jnp.asarray(np.kron(eye, np.ones((dim_head, dim_head), np.float32)))


class _RMSNormGain(nn.Module):
    """Parameter holder with RMSNorm's tree ('g' under this scope)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param('g', nn.initializers.ones, (self.dim,), jnp.float32)


class _Conv1x1Weights(nn.Module):
    """Parameter holder with nn.Conv's tree (1x1 'kernel' [+ 'bias'])."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (1, 1, self.in_dim, self.out_dim), jnp.float32)
        b = (self.param('bias', nn.initializers.zeros,
                        (self.out_dim,), jnp.float32)
             if self.use_bias else None)
        return k, b


def _pallas_backend_ok() -> bool:
    """Fused whole-block kernels need a real TPU backend; CPU tests
    monkeypatch this (with force_tpu_interpret_mode) to exercise them."""
    return jax.default_backend() not in ('cpu',)


def _use_fused_linattn(n: int, hidden: int, dtype) -> bool:
    """Whole-block Pallas kernel (kernels/linattn_block.py): TPU backend,
    bf16 compute, lane-aligned geometry. CPU tests and fp32 parity runs take
    the XLA path below (identical math)."""
    return (dtype == jnp.bfloat16 and n % 128 == 0 and hidden % 128 == 0
            and _pallas_backend_ok())


def _fused_shard_wrap(b: int):
    """Mesh gate for the fused whole-block kernels.

    The kernels are pure per-batch-element maps, so under a mesh they run
    per-shard via shard_map (batch over 'data', weights replicated) instead
    of letting GSPMD try to partition the pallas_call itself. Requires the
    caller to have set the ambient mesh (jax.sharding.set_mesh), which the
    --mesh serving path does.

    Returns None (no mesh / trivial data axis: call the kernel unwrapped),
    a wrapper callable (shard over 'data'), or False (mesh present but the
    batch doesn't divide the data axis: take the XLA path, which GSPMD
    partitions freely)."""
    am = jax.sharding.get_abstract_mesh()
    if am.empty or 'data' not in am.shape:
        return None
    dp = am.shape['data']
    if dp == 1:
        return None
    if b % dp != 0:
        return False

    def wrap(fn, x, *ws):
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            fn,
            in_specs=(P('data', None, None),) + (P(),) * len(ws),
            out_specs=P('data', None, None), check_vma=False)(x, *ws)
    return wrap




class LinearAttention(nn.Module):
    """Linear attention with softmax-normalized q (over channel) and k (over
    sequence). Parity: /root/reference/model.py:287-324.

    Weights are declared through parameter holders with the exact nn.Conv /
    RMSNorm tree (checkpoints unchanged) so the fused whole-block Pallas
    kernel and the XLA fallback share one set of params. The quantized and
    legacy-pallas paths keep the original submodules (same tree).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quant: Optional[str] = None
    fused: bool = True   # whole-block Pallas kernel when the gate allows;
                         # training (no Pallas autodiff) builds with
                         # fused=False — same math, same params. Under an
                         # ambient mesh the kernel runs per-shard via
                         # shard_map (_fused_shard_wrap)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        if self.quant is not None or self.use_pallas:
            return self._legacy_path(x, b, h, w, c, n, hidden)

        g1 = _RMSNormGain(self.dim, name='norm')()
        wqkv, _ = _Conv1x1Weights(c, hidden * 3, use_bias=False,
                                  name='to_qkv')()
        wout, bout = _Conv1x1Weights(hidden, self.dim, name='to_out')()
        g2 = _RMSNormGain(self.dim, name='out_norm')()

        if self.fused and _use_fused_linattn(n, hidden, self.dtype):
            wrap = _fused_shard_wrap(b)
            if wrap is not False:
                from srgd_tpu.kernels.linattn_block import fused_linattn_block
                wq = wqkv[0, 0, :, :hidden].astype(self.dtype)
                wk = wqkv[0, 0, :, hidden:2 * hidden].astype(self.dtype)
                wv = wqkv[0, 0, :, 2 * hidden:].astype(self.dtype)
                call = functools.partial(fused_linattn_block,
                                         dim_head=self.dim_head)
                args = (x.reshape(b, n, c).astype(self.dtype), g1,
                        wq, wk, wv, wout[0, 0].astype(self.dtype), bout, g2)
                out = call(*args) if wrap is None else wrap(call, *args)
                return out.reshape(b, h, w, c)

        # ---- XLA path (same math, same params) ----
        # TPU layout design: everything stays (b, n, C)-minor with the heads
        # packed in the channel dim (c = head*dim_head + d) — reshaping to
        # (b, n, heads, 32) relayouts the whole activation (measured ~21 ms of
        # a 73 ms dim-128 forward; tools/perf_probe2.py). Per-head softmax of
        # q: subtracting the global row max is exact (softmax is shift-
        # invariant within each head) and the per-head denominators come from
        # one block-diagonal matmul. The context/out contractions run full
        # C x C with cross-head terms zeroed by the same block-diagonal mask.
        y = _rmsnorm_apply(x, g1, c, self.dtype)
        qkv = jnp.einsum('bhwc,co->bhwo', y,
                         wqkv[0, 0].astype(self.dtype))   # 1x1 conv
        out = self._linattn_math(qkv.reshape(b, n, 3 * hidden), hidden)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        out = jnp.einsum('bhwc,co->bhwo', out,
                         wout[0, 0].astype(self.dtype)) + bout.astype(self.dtype)
        return _rmsnorm_apply(out, g2, c, self.dtype)

    def _linattn_math(self, qkv, hidden):
        """qkv (b, n, 3*hidden) -> (b, n, hidden); the round-2 reformulation."""
        blk = _head_blockdiag(hidden, self.dim_head)
        hi = (jax.lax.Precision.DEFAULT if self.dtype == jnp.bfloat16
              else jax.lax.Precision.HIGHEST)

        q = _f32(qkv[..., :hidden])
        k = _f32(qkv[..., hidden:2 * hidden])
        v = qkv[..., 2 * hidden:].astype(self.dtype)

        eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        denom = jnp.einsum('bnc,ce->bne', eq, blk, precision=hi)
        qn = (eq / denom * (self.dim_head ** -0.5)).astype(self.dtype)

        ek = jnp.exp(k - jnp.max(k, axis=1, keepdims=True))  # softmax over n
        kn = (ek / jnp.sum(ek, axis=1, keepdims=True)).astype(self.dtype)

        # context[d, e] = sum_n kn[n, d] v[n, e] (cross-head terms masked);
        # out[n, e] = sum_d qn[n, d] context[d, e]. Big operands stream in
        # compute dtype with f32 accumulation.
        context = jnp.einsum('bnd,bne->bde', kn, v,
                             preferred_element_type=jnp.float32)
        context = (context * blk[None]).astype(self.dtype)
        return jnp.einsum('bnd,bde->bne', qn, context,
                          preferred_element_type=jnp.float32)

    def _legacy_path(self, x, b, h, w, c, n, hidden):
        """Original submodule-based path: QuantConv trees and the opt-in
        round-1 Pallas kernels (same param layout as the holders above)."""
        y = RMSNorm(self.dim, dtype=self.dtype, name='norm')(x)
        qkv = _conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                    quant=self.quant, name='to_qkv')(y)

        if self.use_pallas and n % 256 == 0:
            from srgd_tpu.kernels.linear_attention import (
                fused_linear_attention_qkv)
            out = fused_linear_attention_qkv(qkv.reshape(b, n, 3 * hidden),
                                             dim_head=self.dim_head)
            out = out.reshape(b, h, w, hidden).astype(self.dtype)
            out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name='to_out')(out)
            return RMSNorm(self.dim, dtype=self.dtype, name='out_norm')(out)

        out = self._linattn_math(qkv.reshape(b, n, 3 * hidden), hidden)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        out = _conv(self.dim, (1, 1), dtype=self.dtype, quant=self.quant,
                    name='to_out')(out)
        return RMSNorm(self.dim, dtype=self.dtype, name='out_norm')(out)


def _rmsnorm_apply(x, g, dim, dtype):
    """Functional RMSNorm with an externally-held gain (same math as the
    RMSNorm module: f32 stats, torch F.normalize eps)."""
    xf = _f32(x)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    out = xf / jnp.maximum(norm, 1e-12) * g * math.sqrt(dim)
    return out.astype(dtype)


class Attention(nn.Module):
    """Full softmax attention over the flattened spatial grid.

    Parity: /root/reference/model.py:326-355 + library Attend (plain SDPA,
    scale = dim_head^-0.5). Softmax in float32. ``use_pallas`` switches to the
    round-1 SDPA-only Pallas kernel; ``fused`` (default) runs the whole block
    through kernels/attn_block.py on TPU/bf16.

    The full-attention instances sit at the 32x32 bottleneck where the 1x1
    convs are a negligible FLOP share, so attention always computes in the
    net dtype even under int8 quantization (``quant`` accepted for signature
    compat; int8 requant bandwidth costs more than it saves at n=1024).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quant: Optional[str] = None
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        g1 = _RMSNormGain(self.dim, name='norm')()
        wqkv, _ = _Conv1x1Weights(c, hidden * 3, use_bias=False,
                                  name='to_qkv')()
        wout, bout = _Conv1x1Weights(hidden, self.dim, name='to_out')()

        fused_ok = (self.fused and self.dtype == jnp.bfloat16
                    and n <= 2048 and n % 8 == 0 and hidden % 128 == 0
                    and _pallas_backend_ok())
        if fused_ok:
            wrap = _fused_shard_wrap(b)
            if wrap is not False:
                from srgd_tpu.kernels.attn_block import fused_attn_block
                call = functools.partial(fused_attn_block, heads=self.heads,
                                         dim_head=self.dim_head)
                args = (x.reshape(b, n, c).astype(self.dtype), g1,
                        wqkv[0, 0].astype(self.dtype),
                        wout[0, 0].astype(self.dtype), bout)
                out = call(*args) if wrap is None else wrap(call, *args)
                return out.reshape(b, h, w, c)

        y = _rmsnorm_apply(x, g1, c, self.dtype)
        qkv = jnp.einsum('bhwc,co->bhwo', y,
                         wqkv[0, 0].astype(self.dtype))   # 1x1 conv
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (b, heads, n, d)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        if self.use_pallas:
            from srgd_tpu.kernels.attention import fused_attention
            out = fused_attention(q, k, v)
        else:
            scale = self.dim_head ** -0.5
            sim = jnp.einsum('bhnd,bhmd->bhnm', _f32(q), _f32(k),
                             preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum('bhnm,bhmd->bhnd', attn, _f32(v),
                             preferred_element_type=jnp.float32)

        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden).astype(self.dtype)
        out = jnp.einsum('bhwc,co->bhwo', out,
                         wout[0, 0].astype(self.dtype)) + bout.astype(self.dtype)
        return out


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------

class PixelShuffleUpsample(nn.Module):
    """conv1x1 (dim -> 4*dim_out) -> SiLU -> depth-to-space(2).

    Parity: /root/reference/model.py:70-98 incl. the checkerboard-free
    repeated-kaiming init of the conv (each group of 4 output channels starts
    identical; affects training-from-scratch parity only).
    """

    dim: int
    dim_out: int
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        def repeated_kaiming(key, shape, dtype=jnp.float32):
            # torch kaiming_uniform_ default: a=sqrt(5) leaky-relu gain over
            # fan_in of the (dim_out, dim, 1, 1) sub-kernel, repeated 4x.
            h, w, i, o = shape
            sub = o // 4
            gain = math.sqrt(2.0 / (1 + 5.0))
            bound = gain * math.sqrt(3.0 / (i * h * w))
            base = jax.random.uniform(key, (h, w, i, sub), dtype, -bound, bound)
            # einops repeat 'o ... -> (o 4) ...': out channel c*4 + rep, i.e.
            # all 4 subpixel positions of a channel start identical
            return jnp.repeat(base, 4, axis=-1)

        y = _conv(self.dim_out * 4, (1, 1), dtype=self.dtype,
                  quant=self.quant, kernel_init=repeated_kaiming,
                  bias_init=nn.initializers.zeros, name='conv')(x)
        y = jax.nn.silu(y)
        b, h, w, c = y.shape
        # torch PixelShuffle: in-channel o = c*4 + dy*2 + dx
        y = y.reshape(b, h, w, self.dim_out, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(b, h * 2, w * 2, self.dim_out)


class NearestUpsample(nn.Module):
    """nearest x2 -> conv3x3. Parity: /root/reference/model.py:100-104."""

    dim_out: int
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                     quant=self.quant, name='conv')(x)


class Downsample(nn.Module):
    """space-to-depth(2) -> conv1x1. Parity: /root/reference/model.py:106-110.

    torch Rearrange packs channel o = c*4 + p1*2 + p2.
    """

    dim_out: int
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 5, 2, 4)
        y = y.reshape(b, h // 2, w // 2, c * 4)
        return _conv(self.dim_out, (1, 1), dtype=self.dtype,
                     quant=self.quant, name='conv')(y)
