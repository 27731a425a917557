"""The SR denoiser U-Nets (Flax linen, NHWC).

One module covers both reference nets: ``SRUnet`` (/root/reference/model.py:359-532)
and ``ConditionalSRUnet`` (model.py:536-725) — they are identical except for the
class-embedding MLP added to the time embedding (model.py:692-694). Passing
``num_classes=None`` gives the unconditional net.

TPU-native differences from the reference:
- NHWC layout, optional bfloat16 compute (normalization stats stay float32).
- The LR condition "null" for classifier-free guidance is an all-zeros condition
  image (exactly what the reference's ``default(x_self_cond, zeros_like)`` does,
  model.py:681-684) and the class "null" is a per-sample ``class_mask`` that
  zeroes the class embedding *addition* (the reference omits the add,
  model.py:692-694 — identical math). Both nulls are therefore expressible
  inside a single batched forward, enabling fused doubled-batch CFG.
- Module names mirror torch Sequential indices (downs_{i}_{j}, ...) so
  checkpoint conversion is a mechanical key rewrite.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from srgd_tpu.nn.layers import (
    Attention,
    ClassMLP,
    Downsample,
    LinearAttention,
    NearestUpsample,
    PixelShuffleUpsample,
    ResnetBlock,
    TimeMLP,
)
from srgd_tpu.nn.quant import conv as _conv

Dtype = Any


class SRUnet(nn.Module):
    """4-stage conv+attention U-Net denoiser with LR-image channel-concat
    conditioning and optional degradation-class conditioning.

    Input channels = 2 * channels (noisy image concat condition image,
    model.py:491-494); H, W must be divisible by 2**(stages-1) = 8.
    """

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = True          # LR condition via channel concat
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16
    attn_dim_head: int = 32
    attn_heads: int = 4
    full_attn: Sequence[bool] = (False, False, False, True)
    pixel_shuffle_upsample: bool = True
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32
    use_pallas: bool = False            # fused GN+SiLU and linear attention
    use_pallas_attention: bool = False  # flash kernel for full attention
    remat: bool = False
    quant: Optional[str] = None         # 'w8a8' -> int8-MXU convs (inference);
                                        # init_conv/final_conv stay high-precision
    quant_min_channels: int = 0         # only quantize blocks this wide or wider
                                        # (shallow big-spatial stages gain least
                                        # from int8 and pay the most requant
                                        # bandwidth — docs/PERF.md)
    fused_linattn: bool = True          # whole-block Pallas linear attention
                                        # (kernels/linattn_block.py); off for
                                        # training and mesh-sharded serving

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    def _quant(self, width: int) -> Optional[str]:
        return self.quant if width >= self.quant_min_channels else None

    def _block_cls(self, cls):
        # remat: recompute block-internal activations in backward instead of
        # saving them — the conv/GN intermediates inside ResnetBlock and the
        # attention tensors dominate training HBM at 256px. nn.remat keeps
        # module names, so checkpoints are unaffected.
        return nn.remat(cls) if self.remat else cls

    def _attn(self, dim, is_full, name):
        if is_full:
            cls = self._block_cls(Attention)
            return cls(dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
                       dtype=self.dtype, quant=self._quant(dim),
                       use_pallas=self.use_pallas_attention,
                       fused=self.fused_linattn, name=name)
        cls = self._block_cls(LinearAttention)
        return cls(dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
                   dtype=self.dtype, use_pallas=self.use_pallas,
                   quant=self._quant(dim), fused=self.fused_linattn, name=name)

    @nn.compact
    def __call__(self, x, time, cond=None, class_label=None, class_mask=None,
                 deep_cache=None, cache_depth: int = 0,
                 return_cache: bool = False):
        """x: (B,H,W,C) noisy image in [-1,1]; time: (B,) float conditioning
        scalar (t index / log-SNR / c_noise depending on family); cond:
        (B,H,W,C) LR condition or None (-> zeros = CFG null); class_label:
        (B,) int or None; class_mask: (B,) float gating the class-embedding
        add per sample (None -> all ones).

        Deep-feature caching (DeepCache / "Faster Diffusion"-style
        training-free sampling acceleration; arXiv 2312.09608 — no
        reference counterpart): with ``cache_depth = d`` (1 <= d <
        len(dim_mults)), the net splits at U-Net stage d. A FULL forward
        (``return_cache=True``) additionally returns the decoder feature
        entering the shallow half — shape (B, H/2^(d-1), W/2^(d-1),
        dims[d]) — and a CACHED forward (``deep_cache=<that tensor>``)
        skips encoder stages >= d, the mid block, and decoder stages >= d
        entirely, substituting the cached feature. With a cache produced
        from the *same* (x, time) the two paths are bitwise identical; the
        sampler-level approximation is reusing it across nearby timesteps
        (the deep, low-resolution features evolve slowly along the
        trajectory). Both flags are trace-time static (two compiled
        programs); params are identical (the cached program just reads a
        subset)."""
        assert x.shape[1] % self.downsample_factor == 0 and \
            x.shape[2] % self.downsample_factor == 0, \
            f'input spatial dims {x.shape[1:3]} must be divisible by {self.downsample_factor}'
        if deep_cache is not None or return_cache:
            assert 1 <= cache_depth < len(self.dim_mults), \
                f'cache_depth must be in [1, {len(self.dim_mults) - 1}], got {cache_depth}'
        assert not (deep_cache is not None and return_cache), \
            'a cached forward cannot also produce a fresh cache'

        dim = self.dim
        init_dim = self.init_dim or dim
        dims = [init_dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_stages = len(in_out)
        time_dim = dim * 4
        groups = self.resnet_block_groups

        if self.self_condition:
            if cond is None:
                cond = jnp.zeros_like(x)
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)

        x = x.astype(self.dtype)
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype, name='init_conv')(x)
        r = x

        t = TimeMLP(dim=dim, time_dim=time_dim,
                    learned_sinusoidal=self.learned_sinusoidal_cond,
                    learned_sinusoidal_dim=self.learned_sinusoidal_dim,
                    dtype=self.dtype, name='time_mlp')(time)

        if self.num_classes is not None and class_label is not None:
            c = ClassMLP(self.num_classes, dim, time_dim, dtype=self.dtype,
                         name='class_mlp')(class_label)
            if class_mask is not None:
                c = c * class_mask[:, None].astype(c.dtype)
            t = t + c

        block = lambda d_in, d_out, name: self._block_cls(ResnetBlock)(
            d_in, d_out, time_emb_dim=time_dim, groups=groups, dtype=self.dtype,
            use_pallas=self.use_pallas, quant=self._quant(min(d_in, d_out)),
            name=name)

        skip_deep = deep_cache is not None   # shallow-only (cached) forward

        hs = []
        for i, (d_in, d_out) in enumerate(in_out):
            if skip_deep and i >= cache_depth:
                break
            is_last = i >= num_stages - 1
            x = block(d_in, d_in, f'downs_{i}_0')(x, t)
            hs.append(x)
            x = block(d_in, d_in, f'downs_{i}_1')(x, t)
            x = self._attn(d_in, self.full_attn[i], f'downs_{i}_2')(x) + x
            hs.append(x)
            if skip_deep and i == cache_depth - 1:
                break    # this stage's downsample only feeds the skipped deep half
            if not is_last:
                x = Downsample(d_out, dtype=self.dtype, quant=self._quant(d_in),
                               name=f'downs_{i}_3')(x)
            else:
                x = _conv(d_out, (3, 3), padding=1, dtype=self.dtype,
                          quant=self._quant(d_in), name=f'downs_{i}_3')(x)

        if not skip_deep:
            mid_dim = dims[-1]
            x = block(mid_dim, mid_dim, 'mid_block1')(x, t)
            x = self._attn(mid_dim, True, 'mid_attn')(x) + x
            x = block(mid_dim, mid_dim, 'mid_block2')(x, t)

        if skip_deep:
            x = deep_cache   # the deep half's output, reused from a full step

        cache_out = None
        rev = list(zip(reversed(in_out), reversed(list(self.full_attn))))
        for i, ((d_in, d_out), is_full) in enumerate(rev):
            stage = num_stages - 1 - i
            if skip_deep and stage >= cache_depth:
                continue
            is_last = i == num_stages - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block(d_out + d_in, d_out, f'ups_{i}_0')(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block(d_out + d_in, d_out, f'ups_{i}_1')(x, t)
            x = self._attn(d_out, is_full, f'ups_{i}_2')(x) + x
            if not is_last:
                if self.pixel_shuffle_upsample:
                    x = PixelShuffleUpsample(d_out, d_in, dtype=self.dtype,
                                             quant=self._quant(d_out),
                                             name=f'ups_{i}_3')(x)
                else:
                    x = NearestUpsample(d_in, dtype=self.dtype,
                                        quant=self._quant(d_out),
                                        name=f'ups_{i}_3')(x)
            else:
                x = _conv(d_in, (3, 3), padding=1, dtype=self.dtype,
                          quant=self._quant(d_out), name=f'ups_{i}_3')(x)
            if return_cache and stage == cache_depth:
                cache_out = x   # decoder feature entering the shallow half

        x = jnp.concatenate([x, r], axis=-1)
        x = self._block_cls(ResnetBlock)(
            dim * 2, dim, time_emb_dim=time_dim, groups=groups,
            dtype=self.dtype, use_pallas=self.use_pallas,
            quant=self._quant(dim), name='final_res_block')(x, t)

        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, name='final_conv')(x)
        if return_cache:
            return x.astype(jnp.float32), cache_out
        return x.astype(jnp.float32)


def _quant_spec(conf):
    """Config -> conv quant spec string ('w8a8[:<alpha>[:<cal_mode>]]' or
    None)."""
    if conf.quantize == 'none':
        return None
    if conf.quantize != 'w8a8':
        # reject rather than misread (e.g. 'w8a8cal' is not a config value:
        # calibration is a runtime step — calibrate_sampler / the CLI's
        # --quant_calibrate — on top of quantize: 'w8a8')
        raise ValueError(f"unknown quantize {conf.quantize!r}: expected "
                         "'none' or 'w8a8'")
    alpha = getattr(conf, 'quantize_smooth_alpha', 0.0)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f'quantize_smooth_alpha must be in [0, 1], '
                         f'got {alpha}')
    cal_mode = getattr(conf, 'quantize_cal_mode', 'max')
    if cal_mode != 'max':
        if alpha > 0.0:
            raise ValueError('quantize_cal_mode != max cannot be combined '
                             'with quantize_smooth_alpha > 0 (the static-'
                             'scale mechanisms compound, docs/PERF.md)')
        return f'w8a8:0:{cal_mode}'
    if alpha > 0.0:
        return f'w8a8:{alpha:g}'
    return conf.quantize


def build_unet_from_config(conf, dtype=None) -> SRUnet:
    """Factory matching get_model's U-Net construction
    (/root/reference/model.py:3500-3532). Both 'conditional' and plain model
    names produce a working net here (the reference's unconditional path
    crashes on phantom free-u kwargs, SURVEY.md section 2.13.1 — fixed by design)."""
    dim_mults = tuple(int(e) for e in conf.ddpm_unet_dim_mults.split(','))
    full_attn = tuple(e.strip() == 'True' for e in conf.full_attn.split(','))
    is_conditional = 'conditional' in conf.model
    if dtype is None:
        dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[conf.compute_dtype]
    return SRUnet(
        dim=conf.unet_dim,
        dim_mults=dim_mults,
        full_attn=full_attn,
        learned_variance=conf.learned_variance,
        learned_sinusoidal_cond=conf.learned_sinusoidal_cond,
        learned_sinusoidal_dim=conf.learned_sinusoidal_dim,
        pixel_shuffle_upsample=conf.pixel_shuffle_upsample,
        num_classes=conf.num_classes if is_conditional else None,
        dtype=dtype,
        use_pallas=conf.use_pallas_kernels,
        # flash_attn toggles the reference's fused-attention kernel
        # (config.py:117, Attend(flash=...)); ours is the Pallas kernel
        use_pallas_attention=conf.flash_attn,
        remat=conf.remat_unet,
        quant=_quant_spec(conf),
        quant_min_channels=conf.quantize_min_channels,
        fused_linattn=conf.fused_linattn,
    )
