"""Discrete-time Gaussian diffusion (DDPM/DDIM family).

Reimplements GaussianDiffusionSR / ConditionalGaussianDiffusionSR
(/root/reference/model.py:781-1728) as pure jittable functions with the same
scan/tiling/CFG architecture as the continuous family (continuous.py).

Math parity:
- buffers re-derived from float64 beta tables (schedules.make_discrete_schedule,
  matching the locally re-registered buffers at model.py:859-907);
- model_predictions per objective incl. clip_x_start + rederive_pred_noise
  (model.py:1449-1489);
- ancestral p_sample via q_posterior mean/log-variance (model.py:1491-1514);
- DDIM update x0*sqrt(ac_next) + sqrt(1-ac_next-sigma^2)*eps + sigma*noise with
  eta=0 (model.py:1565-1641), terminal time_next<0 -> img = x0;
- tiled sampler = DDIM update on the alternating tile grids with odd-step
  margin re-noise q_sample(zeros, t_next) (model.py:1079-1227).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srgd_tpu.diffusion import schedules
from srgd_tpu.diffusion.base import (
    GUIDANCE_COND, chunked_map, crop_frames,
    guided_denoise, normalize_to_neg_one_to_one, pad_tiles_to_multiple,
    prepare_tile_context, resolve_guidance_mode, run_tiled_host_loop,
    select_time_stats,
    unnormalize_to_zero_to_one,
)
from srgd_tpu.tiling import (
    extract_tiles, make_geometry, reflect_pad, scatter_tiles,
)

OBJECTIVES = ('pred_noise', 'pred_x0', 'pred_v')


def ddim_time_pairs(total_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """[(T-1,T-2'),...,(t,-1)] pairs from linspace(-1, T-1, steps+1) reversed,
    truncated to ints (parity: model.py:1573-1575; float64 linspace — for the
    shipped divisible configs the grid is exact)."""
    times = np.linspace(-1, total_timesteps - 1, sampling_timesteps + 1)
    times = list(reversed(times.astype(np.int64).tolist()))
    return np.asarray(list(zip(times[:-1], times[1:])), dtype=np.int32)


@dataclass(eq=False)
class GaussianDiffusion:
    """DDPM/DDIM wrapper; covers conditional + unconditional variants."""

    net: Any
    image_size: int
    channels: int = 3
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    objective: str = 'pred_noise'
    beta_schedule: str = 'linear'
    ddim_sampling_eta: float = 0.0
    offset_noise_strength: float = 0.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    cond_drop_prob: float = 0.0
    class_cond_drop_prob: float = 0.0
    loss_type: str = 'l2'
    deep_cache_interval: int = 0  # >1: recompute the U-Net's deep half only
                                  # every Nth step (per grid parity when
                                  # tiled) — same DeepCache semantics as
                                  # continuous.py; 0/1 = exact sampling
    deep_cache_depth: int = 2
    deep_cache_schedule: str = ''  # non-uniform refresh positions
                                   # (base.refresh_mask segment syntax);
                                   # '' = uniform every dc-th step

    def __post_init__(self):
        assert self.objective in OBJECTIVES, (
            'objective must be either pred_noise (predict noise) or pred_x0 '
            '(predict image start) or pred_v (predict v)')
        self.sched = schedules.make_discrete_schedule(
            self.beta_schedule, self.timesteps, self.objective,
            self.min_snr_loss_weight, self.min_snr_gamma)
        if self.sampling_timesteps is None:
            self.sampling_timesteps = self.timesteps
        assert self.sampling_timesteps <= self.timesteps
        self.is_ddim_sampling = self.sampling_timesteps < self.timesteps
        self._jit_cache = {}

    # ------------------------------------------------------------------
    def calibration_times(self, params, n: int = 6):
        """Representative net time inputs (timestep indices spanning [0, T))
        for W8A8 PTQ calibration (nn/quant.py)."""
        import numpy as np
        return jnp.asarray(np.linspace(0, self.timesteps - 1, n,
                                       dtype=np.float32))

    def net_apply(self, params, x, time_b, cond, class_label, class_mask,
                  **cache_kw):
        params = select_time_stats(params, time_b[0])
        if cache_kw:
            cache_kw['cache_depth'] = self.deep_cache_depth
        return self.net.apply(params, x, time_b.astype(jnp.float32), cond=cond,
                              class_label=class_label, class_mask=class_mask,
                              **cache_kw)

    # ------------------------------------------------------------------
    # x0 / eps conversions (library-inherited formulas, SURVEY.md 2.11)
    # ------------------------------------------------------------------
    def predict_start_from_noise(self, x, t, eps):
        s = self.sched
        return s.sqrt_recip_alphas_cumprod[t] * x - s.sqrt_recipm1_alphas_cumprod[t] * eps

    def predict_noise_from_start(self, x, t, x0):
        s = self.sched
        return (s.sqrt_recip_alphas_cumprod[t] * x - x0) / s.sqrt_recipm1_alphas_cumprod[t]

    def predict_start_from_v(self, x, t, v):
        s = self.sched
        return s.sqrt_alphas_cumprod[t] * x - s.sqrt_one_minus_alphas_cumprod[t] * v

    def predict_v(self, x0, t, eps):
        s = self.sched
        return s.sqrt_alphas_cumprod[t] * eps - s.sqrt_one_minus_alphas_cumprod[t] * x0

    def q_posterior(self, x0, x, t):
        s = self.sched
        mean = s.posterior_mean_coef1[t] * x0 + s.posterior_mean_coef2[t] * x
        return mean, s.posterior_variance[t], s.posterior_log_variance_clipped[t]

    def q_sample(self, x0, t, noise):
        """t: scalar or (B,) int (broadcast over trailing dims by the caller).
        Parity: standard q_sample the reference inherits (SURVEY.md 2.11)."""
        s = self.sched
        return s.sqrt_alphas_cumprod[t] * x0 + s.sqrt_one_minus_alphas_cumprod[t] * noise

    # ------------------------------------------------------------------
    def model_predictions(self, params, x, t, cond, class_label, mode, scale,
                          clip_x_start=False, rederive_pred_noise=False,
                          deep_cache=None, return_cache=False):
        """t: traced int scalar. Returns (pred_noise, x_start)[, cache].
        Parity: model.py:1449-1489."""
        time_b = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        out = guided_denoise(self.net_apply, params, x, time_b, cond,
                             class_label, mode, scale,
                             deep_cache=deep_cache, return_cache=return_cache)
        cache = None
        if return_cache:
            out, cache = out
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if self.objective == 'pred_noise':
            eps = out
            x0 = clip(self.predict_start_from_noise(x, t, eps))
            if clip_x_start and rederive_pred_noise:
                eps = self.predict_noise_from_start(x, t, x0)
        elif self.objective == 'pred_x0':
            x0 = clip(out)
            eps = self.predict_noise_from_start(x, t, x0)
        else:  # pred_v
            x0 = clip(self.predict_start_from_v(x, t, out))
            eps = self.predict_noise_from_start(x, t, x0)
        return (eps, x0, cache) if return_cache else (eps, x0)

    # ------------------------------------------------------------------
    # Ancestral sampler (full T steps). Parity: model.py:1502-1563.
    # ------------------------------------------------------------------
    def p_sample_step(self, params, x, t, cond, class_label, noise, mode, scale,
                      deep_cache=None, return_cache=False):
        out = self.model_predictions(params, x, t, cond, class_label, mode,
                                     scale, deep_cache=deep_cache,
                                     return_cache=return_cache)
        (_, x0, cache) = out if return_cache else (out + (None,))
        x0 = jnp.clip(x0, -1.0, 1.0)  # clip_denoised=True (model.py:1496-1497)
        mean, _, log_var = self.q_posterior(x0, x, t)
        nxt = mean + jnp.asarray(t > 0, jnp.float32) \
            * jnp.exp(0.5 * log_var) * noise  # no noise at t == 0
        return (nxt, x0, cache) if return_cache else (nxt, x0)

    def p_sample_loop(self, params, rng, cond, class_label, *, cond_scale=1.0,
                      guidance_start_steps=0, class_cond_scale=1.0,
                      class_guidance_start_steps=0, generation_start_steps=0,
                      capture_trajectory=False, capture_x0=False):
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        T = self.timesteps
        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            target_t = T - generation_start_steps
            noise = jax.random.normal(init_key, cond.shape, jnp.float32)
            img = self.q_sample(cond, target_t, noise)
        else:
            img = jax.random.normal(init_key, cond.shape, jnp.float32)
        init_img = img  # frame 0 of both capture stacks (model.py:985-987)
        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        if dc:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask = jnp.asarray(refresh_mask(
                self.deep_cache_schedule, dc, T - generation_start_steps))

        def step(carry, i):
            img, cache = carry if dc else (carry, None)
            t = T - 1 - i
            key = jax.random.fold_in(rng, i)
            cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
            ccs = jnp.where(i < class_guidance_start_steps, 1.0, class_cond_scale)
            scale = cs if mode == GUIDANCE_COND else ccs
            noise = jax.random.normal(key, img.shape, jnp.float32)
            if dc:
                refresh = dc_mask[i - generation_start_steps]
                img, x0, cache = jax.lax.cond(
                    refresh,
                    lambda a: self.p_sample_step(
                        params, a[0], t, cond, class_label, noise, mode,
                        scale, return_cache=True),
                    lambda a: self.p_sample_step(
                        params, a[0], t, cond, class_label, noise, mode,
                        scale, deep_cache=a[1]) + (a[1],),
                    (img, cache))
            else:
                img, x0 = self.p_sample_step(params, img, t, cond, class_label,
                                             noise, mode, scale)
            return ((img, cache) if dc else img), (
                img if capture_trajectory else None,
                x0 if capture_x0 else None)

        idxs = jnp.arange(generation_start_steps, T)
        carry = img
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            carry = (img, cache_zeros(self.net, self.deep_cache_depth,
                                      img.shape[0], img.shape[1],
                                      img.shape[2], mode))
        carry, (traj, x0_traj) = jax.lax.scan(step, carry, idxs)
        img = carry[0] if dc else carry
        out = unnormalize_to_zero_to_one(img)  # parity: no final clamp in
        # the reference ancestral loop (model.py:1557-1563)
        rets = (out,)
        if capture_trajectory:
            rets = rets + (jnp.concatenate([init_img[None], traj]),)
        if capture_x0:
            rets = rets + (jnp.concatenate([init_img[None], x0_traj]),)
        return rets if len(rets) > 1 else out

    # ------------------------------------------------------------------
    # DDIM sampler. Parity: model.py:1565-1641 (eta = 0).
    # ------------------------------------------------------------------
    def ddim_step(self, params, x, time, time_next, cond, class_label, noise,
                  mode, scale, deep_cache=None, return_cache=False):
        """One DDIM update; time/time_next traced int scalars (time_next may
        be -1 on the terminal step -> return x0)."""
        out = self.model_predictions(params, x, time, cond, class_label,
                                     mode, scale, clip_x_start=True,
                                     rederive_pred_noise=True,
                                     deep_cache=deep_cache,
                                     return_cache=return_cache)
        (eps, x0, cache) = out if return_cache else (out + (None,))
        s = self.sched
        alpha = s.alphas_cumprod[time]
        alpha_next = s.alphas_cumprod[jnp.maximum(time_next, 0)]
        eta = self.ddim_sampling_eta
        sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma ** 2, 0.0))
        img = x0 * jnp.sqrt(alpha_next) + c * eps + sigma * noise
        nxt = jnp.where(time_next < 0, x0, img)
        return (nxt, x0, cache) if return_cache else (nxt, x0)

    def ddim_sample(self, params, rng, cond, class_label, *, cond_scale=1.0,
                    guidance_start_steps=0, class_cond_scale=1.0,
                    class_guidance_start_steps=0, generation_start_steps=0,
                    sampling_timesteps=None, capture_trajectory=False,
                    capture_x0=False):
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        n_steps = sampling_timesteps or self.sampling_timesteps
        pairs = jnp.asarray(ddim_time_pairs(self.timesteps, n_steps))

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            target_t = int(ddim_time_pairs(self.timesteps, n_steps)[generation_start_steps][0])
            noise = jax.random.normal(init_key, cond.shape, jnp.float32)
            img = self.q_sample(cond, target_t, noise)
        else:
            img = jax.random.normal(init_key, cond.shape, jnp.float32)
        init_img = img  # frame 0 of both capture stacks (model.py:1032-1034)
        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        if dc:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask = jnp.asarray(refresh_mask(
                self.deep_cache_schedule, dc,
                n_steps - generation_start_steps))

        def step(carry, inp):
            img, cache = carry if dc else (carry, None)
            i, (time, time_next) = inp
            key = jax.random.fold_in(rng, i)
            cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
            ccs = jnp.where(i < class_guidance_start_steps, 1.0, class_cond_scale)
            scale = cs if mode == GUIDANCE_COND else ccs
            noise = jax.random.normal(key, img.shape, jnp.float32)
            if dc:
                refresh = dc_mask[i - generation_start_steps]
                img, x0, cache = jax.lax.cond(
                    refresh,
                    lambda a: self.ddim_step(
                        params, a[0], time, time_next, cond, class_label,
                        noise, mode, scale, return_cache=True),
                    lambda a: self.ddim_step(
                        params, a[0], time, time_next, cond, class_label,
                        noise, mode, scale, deep_cache=a[1]) + (a[1],),
                    (img, cache))
            else:
                img, x0 = self.ddim_step(params, img, time, time_next, cond,
                                         class_label, noise, mode, scale)
            return ((img, cache) if dc else img), (
                img if capture_trajectory else None,
                x0 if capture_x0 else None)

        idxs = jnp.arange(generation_start_steps, n_steps)
        carry = img
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            carry = (img, cache_zeros(self.net, self.deep_cache_depth,
                                      img.shape[0], img.shape[1],
                                      img.shape[2], mode))
        carry, (traj, x0_traj) = jax.lax.scan(
            step, carry, (idxs, (pairs[generation_start_steps:, 0],
                                 pairs[generation_start_steps:, 1])))
        img = carry[0] if dc else carry
        out = unnormalize_to_zero_to_one(img)
        rets = (out,)
        if capture_trajectory:
            rets = rets + (jnp.concatenate([init_img[None], traj]),)
        if capture_x0:
            rets = rets + (jnp.concatenate([init_img[None], x0_traj]),)
        return rets if len(rets) > 1 else out

    # ------------------------------------------------------------------
    def sample(self, params, rng, condition_x, class_label=None, *,
               cond_scale=1.0, guidance_start_steps=0, class_cond_scale=1.0,
               class_guidance_start_steps=0, generation_start_steps=0,
               num_sample_steps=None, capture_trajectory=False,
               capture_x0=False):
        """condition_x in [0,1]; dispatch ancestral vs DDIM like the reference
        (model.py:1644-1659)."""
        cond = normalize_to_neg_one_to_one(condition_x)
        kw = dict(cond_scale=cond_scale, guidance_start_steps=guidance_start_steps,
                  class_cond_scale=class_cond_scale,
                  class_guidance_start_steps=class_guidance_start_steps,
                  generation_start_steps=generation_start_steps,
                  capture_trajectory=capture_trajectory, capture_x0=capture_x0)
        if self.is_ddim_sampling:
            return self.ddim_sample(params, rng, cond, class_label,
                                    sampling_timesteps=num_sample_steps, **kw)
        return self.p_sample_loop(params, rng, cond, class_label, **kw)

    # ------------------------------------------------------------------
    # Tiled DDIM sampler. Parity: model.py:1079-1227.
    # ------------------------------------------------------------------
    def tiled_sample(self, params, rng, condition_x, class_label=None, *,
                     batch_size: int = 4, tile_size: int = 256,
                     tile_stride: Optional[int] = None,
                     cond_scale=1.0, guidance_start_steps=0,
                     class_cond_scale=1.0, class_guidance_start_steps=0,
                     generation_start_steps=0, num_sample_steps=None,
                     start_white_noise=True, capture_trajectory=False,
                     capture_x0=False, host_loop=False):
        """capture_trajectory / capture_x0: per-step frame stacks in [-1,1],
        cropped to the output region, frame 0 = cropped init canvas (reference
        with_images/with_x0_images semantics, model.py:1096-1101, 1212-1215 —
        full-canvas per-step frames there; uniformly cropped here)."""
        n_steps = num_sample_steps or self.sampling_timesteps
        b, h, w, ch = condition_x.shape
        geom = make_geometry(h, w, tile_size, tile_stride)
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        pairs_np = ddim_time_pairs(self.timesteps, n_steps)
        pairs = jnp.asarray(pairs_np)

        cond = normalize_to_neg_one_to_one(condition_x)
        cond_padded = reflect_pad(cond, geom.pad)
        canvas_shape = cond_padded.shape

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            target_t = int(pairs_np[generation_start_steps][0])
            noise = jax.random.normal(init_key, canvas_shape, jnp.float32)
            img = self.q_sample(cond_padded, target_t, noise)
        else:
            img = jax.random.normal(init_key, canvas_shape, jnp.float32)

        cond_tiles, label_tiles, n_chunks, chunks, interior_mask = \
            prepare_tile_context(cond_padded, geom, b, batch_size, class_label)

        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        if dc and (capture_trajectory or capture_x0):
            raise NotImplementedError(
                'deep_cache_interval > 1 with tiled debug captures is not '
                'supported (the state stack would also stack the per-tile '
                'deep-feature caches); capture with deep-cache off')
        if dc:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask_np = refresh_mask(
                self.deep_cache_schedule, dc,
                (n_steps - generation_start_steps + 1) // 2 + 1)
            dc_mask = jnp.asarray(dc_mask_np)

        def make_parity_step(parity: int, variant: str = 'std'):
            def pstep(params, state, ctiles, ltiles, rng, i):
                if variant != 'std':
                    img, x0c = state[0], None
                    caches = list(state[1:])
                else:
                    img, x0c = state if capture_x0 else (state, None)
                time, time_next = pairs[i, 0], pairs[i, 1]
                key = jax.random.fold_in(rng, i)
                key_t, key_m = jax.random.split(key)
                cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
                ccs = jnp.where(i < class_guidance_start_steps, 1.0,
                                class_cond_scale)
                scale = cs if mode == GUIDANCE_COND else ccs

                noise_canvas = jax.random.normal(key_t, canvas_shape, jnp.float32)
                tiles = extract_tiles(img, geom, parity)
                tiles, n_orig = pad_tiles_to_multiple(tiles, chunks[parity])
                noise, _ = pad_tiles_to_multiple(
                    extract_tiles(noise_canvas, geom, parity), chunks[parity])

                def chunk_fn(xs, cs_, ns, *rest):
                    if variant == 'cached':
                        cch, rest = rest[0], rest[1:]
                    lb = rest[0] if rest else None
                    if variant == 'full':
                        nx, _, cc = self.ddim_step(
                            params, xs, time, time_next, cs_, lb, ns, mode,
                            scale, return_cache=True)
                        return nx, cc
                    if variant == 'cached':
                        nx, _ = self.ddim_step(
                            params, xs, time, time_next, cs_, lb, ns, mode,
                            scale, deep_cache=cch)
                        return nx
                    nx, xs0 = self.ddim_step(params, xs, time, time_next, cs_,
                                             lb, ns, mode, scale)
                    return (nx, xs0) if capture_x0 else nx

                args = (tiles, ctiles, noise)
                if variant == 'cached':
                    args = args + (caches[parity],)
                if ltiles is not None:
                    args = args + (ltiles,)
                out = chunked_map(chunk_fn, n_chunks[parity], *args)
                if variant == 'full':
                    out, caches[parity] = out
                if capture_x0:
                    img = scatter_tiles(img, out[0][:n_orig], geom, parity)
                    x0c = scatter_tiles(x0c, out[1][:n_orig], geom, parity)
                else:
                    img = scatter_tiles(img, out[:n_orig], geom, parity)

                if parity == 1 and interior_mask is not None:
                    # margin := q_sample(zeros, t_next) = sqrt(1-ac[t_next]) *
                    # noise (model.py:1205-1210); skipped on the terminal step,
                    # where the reference `continue`s first (model.py:1197-1203)
                    s = self.sched
                    coeff = s.sqrt_one_minus_alphas_cumprod[
                        jnp.maximum(time_next, 0)]
                    coeff = jnp.where(time_next < 0, 0.0, coeff)
                    fresh = jax.random.normal(key_m, img.shape, jnp.float32) * coeff
                    stale = img * (1.0 - interior_mask)
                    renoised = jnp.where(time_next < 0, stale,
                                         fresh * (1.0 - interior_mask))
                    img = img * interior_mask + renoised
                if variant != 'std':
                    return (img, caches[0], caches[1])
                return (img, x0c) if capture_x0 else img

            return pstep

        capture = capture_trajectory or capture_x0
        init_img = img
        state = (img, img) if capture_x0 else img
        gss = generation_start_steps
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            state = (img,) + tuple(
                cache_zeros(self.net, self.deep_cache_depth,
                            cond_tiles[p].shape[0], cond_tiles[p].shape[1],
                            cond_tiles[p].shape[2], mode)
                for p in (0, 1))

        indices = range(generation_start_steps, n_steps)
        if host_loop:
            cache_key = ('gauss', geom, n_steps, self.timesteps, mode,
                         cond_scale, class_cond_scale, guidance_start_steps,
                         class_guidance_start_steps, tuple(chunks), tuple(n_chunks),
                         class_label is None, b, self.beta_schedule,
                         self.objective, capture_x0, dc, self.deep_cache_depth,
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
                self._jit_cache, cache_key, builders, select,
                params, state, cond_tiles, label_tiles, rng, indices, capture)
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
                                rng, i),
                            lambda s: steps_pv[(p, 'cached')](
                                params, s, cond_tiles[p], label_tiles[p],
                                rng, i),
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
                                          label_tiles[0], rng, i),
                        lambda s: odd_fn(params, s, cond_tiles[1],
                                         label_tiles[1], rng, i),
                        state)
                    return state, (state if capture else None)

            state, frames = jax.lax.scan(
                step, state, jnp.arange(generation_start_steps, n_steps))

        img = state[0] if (capture_x0 or dc) else state
        left, top, right, bottom = geom.crop
        out = img[:, top:bottom, left:right, :]
        out = unnormalize_to_zero_to_one(jnp.clip(out, -1.0, 1.0))
        if not capture:
            return out
        init_frame = init_img[None, :, top:bottom, left:right, :]
        rets = (out,)
        if capture_trajectory:
            img_frames = frames[0] if capture_x0 else frames
            rets += (jnp.concatenate([init_frame,
                                      crop_frames(img_frames, geom.crop)]),)
        if capture_x0:
            rets += (jnp.concatenate([init_frame,
                                      crop_frames(frames[1], geom.crop)]),)
        return rets

    # ------------------------------------------------------------------
    # Training. Parity: model.py:1661-1728.
    # ------------------------------------------------------------------
    def loss(self, params, rng, img, condition_x, class_label=None, *,
             noise=None, t=None):
        b = img.shape[0]
        k_t, k_n, k_o, k_d1, k_d2 = jax.random.split(rng, 5)
        if t is None:
            t = jax.random.randint(k_t, (b,), 0, self.timesteps)
        x_start = normalize_to_neg_one_to_one(img)
        cond = normalize_to_neg_one_to_one(condition_x)
        if noise is None:
            noise = jax.random.normal(k_n, img.shape, jnp.float32)
        if self.offset_noise_strength > 0.0:
            offset = jax.random.normal(k_o, img.shape[:1] + (1, 1) + img.shape[-1:])
            noise = noise + self.offset_noise_strength * offset

        drop_cond = jax.random.uniform(k_d1, ()) < self.cond_drop_prob
        cond = jnp.where(drop_cond, jnp.zeros_like(cond), cond)
        class_mask = None
        if class_label is not None:
            drop_class = jax.random.uniform(k_d2, ()) < self.class_cond_drop_prob
            class_mask = jnp.where(drop_class, 0.0, 1.0) * jnp.ones((b,), jnp.float32)

        tb = t.reshape((b,) + (1,) * (img.ndim - 1))
        x = self.q_sample(x_start, tb, noise)
        out = self.net_apply(params, x, t, cond, class_label, class_mask)

        if self.objective == 'pred_noise':
            target = noise
        elif self.objective == 'pred_x0':
            target = x_start
        else:
            target = self.predict_v(x_start, tb, noise)

        from srgd_tpu.diffusion.continuous import _elementwise_loss
        err = _elementwise_loss(out, target, self.loss_type)
        losses = jnp.mean(err.reshape(b, -1), axis=1)
        losses = losses * self.sched.loss_weight[t]
        return jnp.mean(losses)
