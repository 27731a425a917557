"""Continuous-time Gaussian diffusion (VDM), the reference's shipped family.

Reimplements ContinuousTimeGaussianDiffusionSR and its conditional variant
(/root/reference/model.py:2679-3495) as pure jittable functions:

- the 250-step ancestral sampler compiles to ONE ``lax.scan`` (the reference
  runs a Python step loop, SURVEY.md section 3.2);
- the alternating-grid tiled sampler is the same scan with a ``lax.cond`` on
  step parity — aligned-grid steps are a space-to-tiles reshape, shifted-grid
  steps a static interior slice; margin re-noising is a masked fresh-noise fill;
- classifier-free guidance is one fused doubled-batch forward (base.py);
- log-SNR values at the static linspace sampling times come from a float64
  precomputed table (schedules.py).

Sampler math parity (model.py:3122-3188):
    c        = -expm1(logSNR - logSNR_next)
    alpha^2  = sigmoid(logSNR),  sigma^2 = sigmoid(-logSNR)
    x0       = (x - sigma * eps_hat) / alpha, clamped to [-1, 1]
    mean     = alpha_next * (x * (1 - c) / alpha + c * x0)
    var      = sigma_next^2 * c
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srgd_tpu.diffusion import schedules
from srgd_tpu.diffusion.base import (
    GUIDANCE_CLASS, GUIDANCE_COND, GUIDANCE_NONE, chunked_map, crop_frames,
    guided_denoise, normalize_to_neg_one_to_one, pad_tiles_to_multiple,
    prepare_tile_context, resolve_guidance_mode, run_tiled_host_loop,
    select_time_stats,
    unnormalize_to_zero_to_one,
)
from srgd_tpu.tiling import (
    extract_tiles, make_geometry, reflect_pad, scatter_tiles,
)


@dataclass(eq=False)
class ContinuousDiffusion:
    """Wraps a denoiser net with continuous-time diffusion sampling/training."""

    net: Any                      # SRUnet (flax module)
    image_size: int
    channels: int = 3
    noise_schedule: str = 'linear'
    num_sample_steps: int = 500
    clip_sample_denoised: bool = True
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    cond_drop_prob: float = 0.0
    class_cond_drop_prob: float = 0.0
    loss_type: str = 'l2'
    learned_noise_schedule_frac_gradient: float = 1.0
    sampler: str = 'ancestral'    # 'ancestral' (reference parity) | 'ddim'
                                  # (eta=ddim_eta update) | 'dpmpp'
                                  # (DPM-Solver++(2M), multistep data
                                  # prediction in half-log-SNR space) —
                                  # additive: the reference's continuous
                                  # family ships ancestral-only
                                  # (model.py:3174-3188); the 2M update is
                                  # the EDM-family math at model.py:2478-2557
                                  # with lambda(t) = logSNR(t)/2
    ddim_eta: float = 0.0         # 'ddim' stochasticity: 0 = deterministic
                                  # DDIM; 1 = ancestral-equivalent variance
                                  # (exact: tested); intermediate values
                                  # trade diversity for few-step accuracy
    deep_cache_interval: int = 0  # >1: recompute the U-Net's deep half only
                                  # every Nth step (per grid parity when
                                  # tiled), reusing the cached deep decoder
                                  # feature in between (DeepCache-style,
                                  # nn/unet.py docstring). 0/1 = exact
                                  # sampling. Training-free approximation —
                                  # quality ladder in docs/PERF.md.
    deep_cache_depth: int = 2     # U-Net stage where the cached deep half
                                  # starts (1..len(dim_mults)-1); smaller =
                                  # more skipped compute, bigger cache
    deep_cache_schedule: str = '' # non-uniform refresh positions (base.
                                  # refresh_mask segment syntax, e.g.
                                  # '0.5x3,0.5x1' = sparse at high noise,
                                  # every step at low noise); '' = uniform
                                  # every deep_cache_interval-th step

    def __post_init__(self):
        self._jit_cache = {}
        if self.sampler not in ('ancestral', 'ddim', 'dpmpp'):
            raise ValueError(
                f"unknown continuous sampler {self.sampler!r}; supported: "
                "'ancestral', 'ddim', 'dpmpp'")
        if self.sampler == 'dpmpp' and self.deep_cache_interval > 1:
            raise NotImplementedError(
                'dpmpp + deep_cache is not supported: the multistep solver '
                'threads a previous-x0 state that would interleave with the '
                'deep-feature cache refresh schedule; use ddim/ancestral '
                'with deep_cache, or dpmpp without it')
        if self.noise_schedule == 'learned':
            # sampling-time table from the learned monotonic net; jitted so
            # host-loop setup does not dispatch eagerly on remote TPUs
            self._learned_table = jax.jit(
                lambda sp, steps: schedules.learned_log_snr(sp, steps))

    # ------------------------------------------------------------------
    def net_apply(self, params, x, time_b, cond, class_label, class_mask,
                  **cache_kw):
        if isinstance(params, dict) and 'log_snr' in params:
            params = {k: v for k, v in params.items() if k != 'log_snr'}
        params = select_time_stats(params, time_b[0])
        if cache_kw:
            cache_kw['cache_depth'] = self.deep_cache_depth
        return self.net.apply(params, x, time_b, cond=cond,
                              class_label=class_label, class_mask=class_mask,
                              **cache_kw)

    def _cache_zeros(self, batch, h, w, mode):
        from srgd_tpu.diffusion.base import cache_zeros
        return cache_zeros(self.net, self.deep_cache_depth, batch, h, w, mode)

    def log_snr(self, t, schedule_params=None):
        """Continuous log-SNR; for the learned schedule, schedule_params is
        the 'log_snr' sub-tree of the full param pytree
        (parity: model.py:2712-2726, 3088-3102)."""
        if self.noise_schedule == 'learned':
            return schedules.learned_log_snr(
                schedule_params, t,
                frac_gradient=self.learned_noise_schedule_frac_gradient)
        return schedules.LOG_SNR_SCHEDULES[self.noise_schedule](t)

    def log_snr_table(self, num_steps: int) -> np.ndarray:
        steps = np.linspace(1.0, 0.0, num_steps + 1)
        return schedules.make_log_snr_table(self.noise_schedule, steps)

    def table(self, params, num_steps: int):
        """Per-step log-SNR values at linspace(1, 0, N+1) sampling times."""
        if self.noise_schedule == 'learned':
            steps = jnp.linspace(1.0, 0.0, num_steps + 1)
            return self._learned_table(params['log_snr'], steps)
        return jnp.asarray(self.log_snr_table(num_steps))

    def calibration_times(self, params, n: int = 6):
        """Representative net time inputs (log-SNR values spanning the
        sampling range) for W8A8 PTQ calibration (nn/quant.py)."""
        return self.table(params, max(n - 1, 1))

    # ------------------------------------------------------------------
    # Core step math
    # ------------------------------------------------------------------
    def p_sample_tiles(self, params, x, cond, class_label, noise,
                       log_snr, log_snr_next, mode: str, scale, is_last,
                       deep_cache=None, return_cache=False,
                       prev_x0=None, log_snr_prev=None, first=None):
        """One reverse step on a batch of tiles (or a whole image batch).

        log_snr / log_snr_next / scale / is_last are traced scalars.
        Returns (next_x, x_start), with the fresh deep-feature cache
        appended when ``return_cache`` is set (deep-cache sampling).

        For sampler='dpmpp', the caller threads the multistep state:
        prev_x0 (previous step's x0 prediction, same shape as x),
        log_snr_prev (traced scalar) and first (traced bool marking the
        first executed step, where the update degenerates to DDIM)."""
        c = -jnp.expm1(log_snr - log_snr_next)
        alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
        alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
        sq_sigma_next = jax.nn.sigmoid(-log_snr_next)

        time_b = jnp.full((x.shape[0],), log_snr, dtype=jnp.float32)
        eps = guided_denoise(self.net_apply, params, x, time_b, cond,
                             class_label, mode, scale,
                             deep_cache=deep_cache, return_cache=return_cache)
        cache = None
        if return_cache:
            eps, cache = eps

        x_start = (x - sigma * eps) / alpha
        if self.sampler == 'dpmpp':
            # DPM-Solver++(2M), data prediction, in lambda = logSNR/2 space:
            #   x_next = (sigma_next/sigma) x - alpha_next expm1(-h) D
            #   D = (1 + 1/(2r)) x0 - 1/(2r) prev_x0,  r = h_prev / h
            # (first executed step: D = x0, the one-step DDIM limit —
            # algebraically identical to the eta=0 update below)
            if self.clip_sample_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            h = 0.5 * (log_snr_next - log_snr)
            h_prev = 0.5 * (log_snr - log_snr_prev)
            r = jnp.where(first, 1.0, h_prev / h)
            d = jnp.where(first, x_start,
                          x_start + (x_start - prev_x0) / (2.0 * r))
            next_x = (jnp.sqrt(sq_sigma_next) / sigma * x
                      - alpha_next * jnp.expm1(-h) * d)
            return (next_x, x_start, cache) if return_cache else (next_x, x_start)

        if self.sampler == 'ddim':
            # eta-DDIM update: x_s = a_s x0 + sqrt(s_s^2 - std^2) eps + std z,
            # std = eta * sqrt(ancestral step variance); eta=0 deterministic,
            # eta=1 matches the ancestral posterior exactly (tested). eps is
            # re-derived from the clipped x0 (the discrete family's
            # clip+rederive semantics, model.py:1475-1487)
            if self.clip_sample_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
                eps = (x - alpha * x_start) / sigma
            if self.ddim_eta:
                std = self.ddim_eta * jnp.sqrt(
                    jnp.maximum(sq_sigma_next * c, 0.0))
                next_x = (alpha_next * x_start
                          + jnp.sqrt(jnp.maximum(sq_sigma_next - std * std,
                                                 0.0)) * eps)
                next_x = jnp.where(is_last, next_x, next_x + std * noise)
            else:
                next_x = (alpha_next * x_start
                          + jnp.sqrt(sq_sigma_next) * eps)
            return (next_x, x_start, cache) if return_cache else (next_x, x_start)

        if self.clip_sample_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
            mean = alpha_next * (x * (1.0 - c) / alpha + c * x_start)
        else:
            mean = alpha_next / alpha * (x - c * sigma * eps)

        var = sq_sigma_next * c
        next_x = jnp.where(is_last, mean, mean + jnp.sqrt(jnp.maximum(var, 0.0)) * noise)
        return (next_x, x_start, cache) if return_cache else (next_x, x_start)

    # ------------------------------------------------------------------
    # q(x_t | x_0)
    # ------------------------------------------------------------------
    def q_sample(self, x_start, times, noise, schedule_params=None):
        """times: (B,) in [0,1]. Parity: model.py:3434-3447."""
        log_snr = self.log_snr(times, schedule_params)
        padded = log_snr.reshape(log_snr.shape + (1,) * (x_start.ndim - 1))
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        return x_start * alpha + noise * sigma, log_snr

    def q_sample_log_snr(self, x_start, log_snr_scalar, noise):
        """q_sample at a fixed (table) log-SNR value."""
        alpha = jnp.sqrt(jax.nn.sigmoid(log_snr_scalar))
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr_scalar))
        return x_start * alpha + noise * sigma

    # ------------------------------------------------------------------
    # Non-tiled ancestral sampler (p_sample_loop) as one scan
    # Parity: model.py:3190-3246
    # ------------------------------------------------------------------
    def sample(self, params, rng, condition_x, class_label=None, *,
               cond_scale: float = 1.0, guidance_start_steps: int = 0,
               class_cond_scale: float = 1.0, class_guidance_start_steps: int = 0,
               generation_start_steps: int = 0,
               num_sample_steps: Optional[int] = None,
               capture_trajectory: bool = False, capture_x0: bool = False,
               init_noise=None, step_noises=None):
        """condition_x: (B,H,W,C) in [0,1]. Returns image(s) in [0,1]
        (plus the img and/or x0 trajectory stacks if requested — the
        reference's with_images / with_x0_images, model.py:3205-3235).

        init_noise (B,H,W,C) / step_noises (N,B,H,W,C) override the internal
        RNG for golden-parity testing against external references (the
        noise-override hook SURVEY.md section 7 calls for)."""
        n_steps = num_sample_steps or self.num_sample_steps
        cond = normalize_to_neg_one_to_one(condition_x)
        table = self.table(params, n_steps)
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)

        rng, init_key = jax.random.split(rng)
        if init_noise is None:
            init_noise = jax.random.normal(init_key, cond.shape, jnp.float32)
        if generation_start_steps > 0:
            img = self.q_sample_log_snr(cond, table[generation_start_steps],
                                        init_noise)
        else:
            img = init_noise
        init_img = img  # frame 0 of both capture stacks (model.py:3205-3211)

        interval = self.deep_cache_interval
        use_px = self.sampler == 'dpmpp'   # multistep: thread previous x0
        if interval > 1:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask = jnp.asarray(refresh_mask(
                self.deep_cache_schedule, interval,
                n_steps - generation_start_steps))

        def step(carry, i):
            if interval > 1:
                img, cache = carry
                px = None
            elif use_px:
                (img, px), cache = carry, None
            else:
                img, px, cache = carry, None, None
            key = jax.random.fold_in(rng, i)
            scale = self._step_scale(i, mode, cond_scale, guidance_start_steps,
                                     class_cond_scale, class_guidance_start_steps)
            if step_noises is None:
                noise = jax.random.normal(key, img.shape, jnp.float32)
            else:
                noise = step_noises[i]
            is_last = i == n_steps - 1
            px_kw = {}
            if use_px:
                px_kw = dict(prev_x0=px,
                             log_snr_prev=table[jnp.maximum(i - 1, 0)],
                             first=i == generation_start_steps)
            if interval > 1:
                # refresh the deep half every Nth executed step; in between
                # only the shallow half runs on the cached deep feature
                def full_fn(args):
                    img, _ = args
                    return self.p_sample_tiles(
                        params, img, cond, class_label, noise,
                        table[i], table[i + 1], mode, scale, is_last,
                        return_cache=True)

                def cached_fn(args):
                    img, cache = args
                    nx, xs = self.p_sample_tiles(
                        params, img, cond, class_label, noise,
                        table[i], table[i + 1], mode, scale, is_last,
                        deep_cache=cache)
                    return nx, xs, cache

                refresh = dc_mask[i - generation_start_steps]
                img, x_start, cache = jax.lax.cond(
                    refresh, full_fn, cached_fn, (img, cache))
            else:
                img, x_start = self.p_sample_tiles(
                    params, img, cond, class_label, noise,
                    table[i], table[i + 1], mode, scale, is_last, **px_kw)
            ys = (img if capture_trajectory else None,
                  x_start if capture_x0 else None)
            if interval > 1:
                out_carry = (img, cache)
            elif use_px:
                out_carry = (img, x_start)
            else:
                out_carry = img
            return out_carry, ys

        idxs = jnp.arange(generation_start_steps, n_steps)
        carry = img
        if interval > 1:
            carry = (img, self._cache_zeros(img.shape[0], img.shape[1],
                                            img.shape[2], mode))
        elif use_px:
            carry = (img, jnp.zeros_like(img))
        carry, (traj, x0_traj) = jax.lax.scan(step, carry, idxs)
        img = carry[0] if (interval > 1 or use_px) else carry

        out = unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))
        rets = (out,)
        if capture_trajectory:
            rets = rets + (jnp.concatenate([init_img[None], traj]),)
        if capture_x0:
            rets = rets + (jnp.concatenate([init_img[None], x0_traj]),)
        return rets if len(rets) > 1 else out

    @staticmethod
    def _step_scale(i, mode, cond_scale, guidance_start_steps,
                    class_cond_scale, class_guidance_start_steps):
        """Guidance warmup gate as a traced per-step scale
        (parity: model.py:3349-3356)."""
        if mode == GUIDANCE_COND:
            return jnp.where(i < guidance_start_steps, 1.0, cond_scale)
        if mode == GUIDANCE_CLASS:
            return jnp.where(i < class_guidance_start_steps, 1.0, class_cond_scale)
        return jnp.float32(1.0)

    # ------------------------------------------------------------------
    # Tiled sampler. Parity: model.py:3288-3413.
    # ------------------------------------------------------------------
    def tiled_sample(self, params, rng, condition_x, class_label=None, *,
                     batch_size: int = 4, tile_size: int = 256,
                     tile_stride: Optional[int] = None,
                     cond_scale: float = 1.0, guidance_start_steps: int = 0,
                     class_cond_scale: float = 1.0,
                     class_guidance_start_steps: int = 0,
                     generation_start_steps: int = 0,
                     num_sample_steps: Optional[int] = None,
                     start_white_noise: bool = True,
                     capture_trajectory: bool = False,
                     capture_x0: bool = False,
                     host_loop: bool = False):
        """condition_x: (B,H,W,C) in [0,1] at TARGET resolution (pre-upscaled
        LR). Returns (B, H, W, C) in [0,1].

        capture_trajectory / capture_x0 mirror the reference's with_images /
        with_x0_images tiled debug captures (model.py:3320-3325, 3398-3401):
        frame stacks in [-1,1] whose frame 0 is the cropped init canvas,
        followed by one frame per executed step. Divergence (documented): the
        reference keeps full-canvas per-step frames; here every frame is
        cropped to the output region so the stack has a uniform shape.

        host_loop=True runs the step loop on the host with per-parity jitted
        step functions (cached on the wrapper) instead of one lax.scan —
        required where the whole-sampler HLO exceeds compile-service limits
        (see base.run_tiled_host_loop); results are identical."""
        n_steps = num_sample_steps or self.num_sample_steps
        b, h, w, ch = condition_x.shape
        geom = make_geometry(h, w, tile_size, tile_stride)
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        table = self.table(params, n_steps)

        cond = normalize_to_neg_one_to_one(condition_x)
        cond_padded = reflect_pad(cond, geom.pad)
        canvas_shape = cond_padded.shape

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            noise = jax.random.normal(init_key, canvas_shape, jnp.float32)
            img = self.q_sample_log_snr(cond_padded, table[generation_start_steps], noise)
        elif start_white_noise:
            img = jax.random.normal(init_key, canvas_shape, jnp.float32)
        else:
            noise = jax.random.normal(init_key, canvas_shape, jnp.float32)
            img = self.q_sample_log_snr(cond_padded, table[0], noise)

        # condition canvas is zeroed outside the shifted-grid interior
        # (model.py:3340-3342); precompute per-parity condition/label tiles.
        cond_tiles, label_tiles, n_chunks, chunks, interior_mask = \
            prepare_tile_context(cond_padded, geom, b, batch_size, class_label)

        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        if dc and (capture_trajectory or capture_x0):
            raise NotImplementedError(
                'deep_cache_interval > 1 with tiled debug captures is not '
                'supported: the per-step state stack would also stack the '
                'per-tile deep-feature caches. Capture with deep-cache off.')
        if dc:
            # refresh positions over the per-parity step counter
            # (i - gss) // 2; both parities share the mask, so '' reproduces
            # the uniform ((i - gss) // 2) % dc == 0 schedule exactly
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask_np = refresh_mask(
                self.deep_cache_schedule, dc,
                (n_steps - generation_start_steps + 1) // 2 + 1)
            dc_mask = jnp.asarray(dc_mask_np)
        # dpmpp threads a previous-x0 canvas through the state, exactly like
        # the capture_x0 x_start canvas (model.py:3331's threading pattern)
        thread_x0 = capture_x0 or self.sampler == 'dpmpp'

        def make_parity_step(parity: int, variant: str = 'std'):
            """One full step on one grid parity, as an explicit-args function
            (jittable standalone for host-loop mode). ``table`` is an argument,
            not a closure, so the cached host-loop jits never capture
            params-derived values (learned schedule) in a stale closure.

            State is the canvas, or (canvas, x0_canvas) when capturing x0
            (the reference threads an x_start canvas, model.py:3331, 3377-3390).
            With deep-cache sampling (variant 'full'/'cached') the state is
            (canvas, cache_even, cache_odd): per-parity stacks of per-tile
            deep-feature caches, refreshed by 'full' steps and consumed
            untouched by 'cached' steps."""

            def pstep(params, state, ctiles, ltiles, rng, i, table):
                if variant != 'std':
                    img, x0c = state[0], None
                    caches = list(state[1:])
                else:
                    img, x0c = state if thread_x0 else (state, None)
                key = jax.random.fold_in(rng, i)
                key_t, key_m = jax.random.split(key)
                scale = self._step_scale(
                    i, mode, cond_scale, guidance_start_steps,
                    class_cond_scale, class_guidance_start_steps)
                # noise at canvas resolution then tiled: bit-identical results
                # regardless of the tile-chunk (batch_size) setting
                noise_canvas = jax.random.normal(key_t, canvas_shape, jnp.float32)
                tiles = extract_tiles(img, geom, parity)
                tiles, n_orig = pad_tiles_to_multiple(tiles, chunks[parity])
                noise, _ = pad_tiles_to_multiple(
                    extract_tiles(noise_canvas, geom, parity), chunks[parity])
                is_last = i == n_steps - 1
                dpmpp = self.sampler == 'dpmpp'
                px_kw = {}
                if dpmpp:
                    # previous-x0 tiles come from the x0 canvas the LAST step
                    # (other grid parity) scattered; scalar multistep state
                    px_kw = dict(log_snr_prev=table[jnp.maximum(i - 1, 0)],
                                 first=i == gss)

                def chunk_fn(xs, cs, ns, *rest):
                    if variant == 'cached':
                        cch, rest = rest[0], rest[1:]
                    if dpmpp:
                        px_kw['prev_x0'], rest = rest[0], rest[1:]
                    lb = rest[0] if rest else None
                    if variant == 'full':
                        nx, _, cc = self.p_sample_tiles(
                            params, xs, cs, lb, ns, table[i], table[i + 1],
                            mode, scale, is_last, return_cache=True)
                        return nx, cc
                    if variant == 'cached':
                        nx, _ = self.p_sample_tiles(
                            params, xs, cs, lb, ns, table[i], table[i + 1],
                            mode, scale, is_last, deep_cache=cch)
                        return nx
                    nx, xs0 = self.p_sample_tiles(
                        params, xs, cs, lb, ns, table[i], table[i + 1],
                        mode, scale, is_last, **px_kw)
                    return (nx, xs0) if thread_x0 else nx

                args = (tiles, ctiles, noise)
                if variant == 'cached':
                    args = args + (caches[parity],)
                if dpmpp:
                    args = args + (pad_tiles_to_multiple(
                        extract_tiles(x0c, geom, parity), chunks[parity])[0],)
                if ltiles is not None:
                    args = args + (ltiles,)
                out = chunked_map(chunk_fn, n_chunks[parity], *args)
                if variant == 'full':
                    out, caches[parity] = out
                if thread_x0:
                    img = scatter_tiles(img, out[0][:n_orig], geom, parity)
                    x0c = scatter_tiles(x0c, out[1][:n_orig], geom, parity)
                else:
                    img = scatter_tiles(img, out[:n_orig], geom, parity)

                if parity == 1 and interior_mask is not None:
                    # margin := q_sample(zeros, t_next) = sigma_next * noise
                    # (model.py:3392-3396); every odd step incl. the final one
                    # (the crop region never overlaps the margin)
                    sigma_next = jnp.sqrt(jax.nn.sigmoid(-table[i + 1]))
                    fresh = jax.random.normal(
                        key_m, img.shape, jnp.float32) * sigma_next
                    img = img * interior_mask + fresh * (1.0 - interior_mask)
                if variant != 'std':
                    return (img, caches[0], caches[1])
                return (img, x0c) if thread_x0 else img

            return pstep

        capture = capture_trajectory or capture_x0
        init_img = img
        # x0 canvas init is never read (first dpmpp step ignores prev_x0;
        # capture frame 0 comes from init_img) — a DISTINCT buffer, because
        # the host loop donates the state and (img, img) would donate one
        # buffer twice
        state = (img, jnp.zeros_like(img)) if thread_x0 else img
        gss = generation_start_steps
        if dc:
            # per-parity stacks of per-tile deep-feature caches, padded to
            # the chunked tile count (zeros are never read: each parity's
            # first visit is a 'full' step)
            state = (img,) + tuple(
                self._cache_zeros(cond_tiles[p].shape[0],
                                  cond_tiles[p].shape[1],
                                  cond_tiles[p].shape[2], mode)
                for p in (0, 1))

        indices = range(generation_start_steps, n_steps)
        if host_loop:
            cache_key = ('cont', geom, n_steps, mode, cond_scale,
                         class_cond_scale, guidance_start_steps,
                         class_guidance_start_steps, tuple(chunks), tuple(n_chunks),
                         class_label is None, b, self.noise_schedule,
                         self.clip_sample_denoised, capture_x0, self.sampler,
                         self.ddim_eta, dc, self.deep_cache_depth,
                         self.deep_cache_schedule)
            if dc:
                builders = {(p, v): (lambda p=p, v=v: make_parity_step(p, v))
                            for p in (0, 1) for v in ('full', 'cached')}
                select = lambda i: (((i % 2), 'full'
                                     if dc_mask_np[(i - gss) // 2]
                                     else 'cached'), i % 2)
            else:
                builders = {0: lambda: make_parity_step(0),
                            1: lambda: make_parity_step(1)}
                select = lambda i: (i % 2, i % 2)
            state, frames = run_tiled_host_loop(
                self._jit_cache, cache_key, builders,
                select, params, state, cond_tiles, label_tiles,
                rng, indices, capture, extra_args=(table,))
        else:
            if dc:
                steps_pv = {(p, v): make_parity_step(p, v)
                            for p in (0, 1) for v in ('full', 'cached')}

                def parity_branch(p):
                    def run(state, i):
                        refresh = dc_mask[(i - gss) // 2]
                        return jax.lax.cond(
                            refresh,
                            lambda s: steps_pv[(p, 'full')](
                                params, s, cond_tiles[p], label_tiles[p],
                                rng, i, table),
                            lambda s: steps_pv[(p, 'cached')](
                                params, s, cond_tiles[p], label_tiles[p],
                                rng, i, table),
                            state)
                    return run

                even_step, odd_step = parity_branch(0), parity_branch(1)

                def step(state, i):
                    state = jax.lax.cond(i % 2 == 0,
                                         lambda s: even_step(s, i),
                                         lambda s: odd_step(s, i), state)
                    return state, None
            else:
                even_fn, odd_fn = make_parity_step(0), make_parity_step(1)

                def step(state, i):
                    state = jax.lax.cond(
                        i % 2 == 0,
                        lambda s: even_fn(params, s, cond_tiles[0],
                                          label_tiles[0], rng, i, table),
                        lambda s: odd_fn(params, s, cond_tiles[1],
                                         label_tiles[1], rng, i, table),
                        state)
                    return state, (state if capture else None)

            state, frames = jax.lax.scan(step, state, jnp.arange(
                generation_start_steps, n_steps))

        img = state[0] if (thread_x0 or dc) else state
        left, top, right, bottom = geom.crop
        out = img[:, top:bottom, left:right, :]
        out = unnormalize_to_zero_to_one(jnp.clip(out, -1.0, 1.0))
        if not capture:
            return out
        init_frame = init_img[None, :, top:bottom, left:right, :]
        rets = (out,)
        if capture_trajectory:
            img_frames = frames[0] if thread_x0 else frames
            rets += (jnp.concatenate([init_frame,
                                      crop_frames(img_frames, geom.crop)]),)
        if capture_x0:
            rets += (jnp.concatenate([init_frame,
                                      crop_frames(frames[1], geom.crop)]),)
        return rets

    # ------------------------------------------------------------------
    # Training loss. Parity: model.py:3449-3495 (+2992-3051 unconditional).
    # ------------------------------------------------------------------
    def loss(self, params, rng, img, condition_x, class_label=None, *,
             noise=None, times=None):
        """img / condition_x in [0,1], shape (B,H,W,C). Returns scalar loss.

        Whole-batch condition dropout with prob cond_drop_prob /
        class_cond_drop_prob (the reference draws ONE uniform per batch,
        model.py:3487-3493)."""
        b = img.shape[0]
        k_t, k_n, k_d1, k_d2 = jax.random.split(rng, 4)
        if times is None:
            times = jax.random.uniform(k_t, (b,), jnp.float32)
        if noise is None:
            noise = jax.random.normal(k_n, img.shape, jnp.float32)

        x_start = normalize_to_neg_one_to_one(img)
        cond = normalize_to_neg_one_to_one(condition_x)

        drop_cond = jax.random.uniform(k_d1, ()) < self.cond_drop_prob
        cond = jnp.where(drop_cond, jnp.zeros_like(cond), cond)

        class_mask = None
        if class_label is not None:
            drop_class = jax.random.uniform(k_d2, ()) < self.class_cond_drop_prob
            class_mask = jnp.where(drop_class, 0.0, 1.0) * jnp.ones((b,), jnp.float32)

        x, log_snr = self.q_sample(
            x_start, times, noise,
            schedule_params=params.get('log_snr')
            if isinstance(params, dict) else None)
        eps_hat = self.net_apply(params, x, log_snr, cond, class_label, class_mask)

        err = _elementwise_loss(eps_hat, noise, self.loss_type)
        losses = jnp.mean(err.reshape(b, -1), axis=1)

        if self.min_snr_loss_weight:
            # parity note: the continuous family clamps snr from BELOW
            # (model.py:3473-3476), unlike the discrete family's clamp-above.
            snr = jnp.exp(log_snr)
            losses = losses * (jnp.maximum(snr, self.min_snr_gamma) / snr)

        return jnp.mean(losses)


def _elementwise_loss(pred, target, loss_type: str):
    if loss_type == 'l2':
        return jnp.square(pred - target)
    if loss_type == 'l1':
        return jnp.abs(pred - target)
    if loss_type == 'smooth_l1':
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    raise ValueError(f'invalid loss type {loss_type}')
