"""EDM (Karras "elucidated") diffusion family.

Reimplements ElucidatedDiffusionSR / ConditionalElucidatedDiffusionSR
(/root/reference/model.py:1731-2600): sigma-preconditioned denoiser forward,
stochastic Heun sampler ("sample_org"), DPM-Solver++(2M), the tiled Heun
sampler with alternating grids, and the EDM training loss.

Scan structure: the Karras schedule ends at sigma = 0, so the final step is
Euler-only (the reference's ``if sigma_next != 0`` branch, model.py:1920-1923)
— we scan the first N-1 Heun steps and unroll the terminal Euler step, rather
than masking a wasted second net call inside the scan.

Documented divergence from the reference: training cond-dropout uses a uniform
draw (P(drop) = p). The reference's EDM forward gates with ``torch.randn(1) < p``
(model.py:2037, 2577-2582), making the actual drop probability ~0.54 for
p = 0.1 — a known defect (SURVEY.md section 2.13.4) in an unreleased code path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from srgd_tpu.diffusion.base import (
    GUIDANCE_COND, chunked_map, crop_frames,
    guided_denoise, normalize_to_neg_one_to_one, pad_tiles_to_multiple,
    prepare_tile_context, resolve_guidance_mode, run_tiled_host_loop,
    select_time_stats,
    unnormalize_to_zero_to_one,
)
from srgd_tpu.diffusion.schedules import EDMParams
from srgd_tpu.tiling import (
    extract_tiles, make_geometry, reflect_pad, scatter_tiles,
)


@dataclass(eq=False)
class ElucidatedDiffusion:
    net: Any
    image_size: int
    channels: int = 3
    num_sample_steps: int = 32
    edm: EDMParams = field(default_factory=EDMParams)
    cond_drop_prob: float = 0.0
    class_cond_drop_prob: float = 0.0
    use_dpmpp_solver: bool = False
    loss_type: str = 'l2'
    deep_cache_interval: int = 0  # >1: recompute the U-Net's deep half only
                                  # every Nth step (per grid parity when
                                  # tiled) — same DeepCache semantics as
                                  # continuous.py. On Heun steps, refresh
                                  # steps run BOTH net evals full (exact
                                  # Heun) and store the second eval's cache
                                  # (closest in time to the cached steps
                                  # that follow); cached steps reuse it for
                                  # both evals. 0/1 = exact sampling
    deep_cache_depth: int = 2
    deep_cache_schedule: str = ''  # non-uniform refresh positions
                                   # (base.refresh_mask segment syntax);
                                   # '' = uniform every dc-th step

    def __post_init__(self):
        self._jit_cache = {}

    # ------------------------------------------------------------------
    def calibration_times(self, params, n: int = 6):
        """Representative net time inputs (c_noise over the Karras sigma
        range) for W8A8 PTQ calibration (nn/quant.py). Returns n values
        like the other families (sample_schedule(n) yields n sigmas plus a
        trailing 0, which is not a valid c_noise input)."""
        sig = self.edm.sample_schedule(max(n, 2))[:-1]  # drop trailing 0
        return self.edm.c_noise(jnp.asarray(sig))

    def net_apply(self, params, x, time_b, cond, class_label, class_mask,
                  **cache_kw):
        params = select_time_stats(params, time_b[0])
        if cache_kw:
            cache_kw['cache_depth'] = self.deep_cache_depth
        return self.net.apply(params, x, time_b, cond=cond,
                              class_label=class_label, class_mask=class_mask,
                              **cache_kw)

    def precond_denoise(self, params, x, sigma, cond, class_label, mode, scale,
                        clamp=False, deep_cache=None, return_cache=False):
        """Preconditioned network forward with CFG merge.

        Parity: model.py:2132-2183. The CFG lerp happens on the FULL
        preconditioned output (c_skip*x + c_out*net), which equals lerping the
        net outputs since c_skip*x is common — we lerp the full outputs exactly
        like the reference. sigma: traced scalar.
        """
        e = self.edm
        b = x.shape[0]
        c_in, c_skip, c_out = e.c_in(sigma), e.c_skip(sigma), e.c_out(sigma)
        c_noise = e.c_noise(sigma)
        time_b = jnp.full((b,), c_noise, dtype=jnp.float32)

        def apply_fn(params, xs, ts, cs, lb, mask, **kw):
            net_out = self.net_apply(params, c_in * xs, ts, cs, lb, mask, **kw)
            if kw.get('return_cache'):
                net_out, cc = net_out
                return c_skip * xs + c_out * net_out, cc
            return c_skip * xs + c_out * net_out

        out = guided_denoise(apply_fn, params, x, time_b, cond, class_label,
                             mode, scale, deep_cache=deep_cache,
                             return_cache=return_cache)
        cache = None
        if return_cache:
            out, cache = out
        if clamp:
            out = jnp.clip(out, -1.0, 1.0)
        return (out, cache) if return_cache else out

    # ------------------------------------------------------------------
    def sigmas_gammas(self, n_steps: int):
        sig = self.edm.sample_schedule(n_steps)      # (N+1,), trailing 0
        gam = self.edm.gammas(sig, n_steps)
        return sig, gam

    def noised_at_step(self, key, x, sigmas, step: int):
        """x + sigmas[step]*noise (get_noised_images, model.py:2185-2194)."""
        return x + sigmas[step] * jax.random.normal(key, x.shape, jnp.float32)

    # ------------------------------------------------------------------
    # Heun stochastic sampler ("sample_org"). Parity: model.py:2211-2306.
    # ------------------------------------------------------------------
    def _heun_step(self, params, x, key, sigma, sigma_next, gamma, cond,
                   class_label, mode, scale, clamp, second_order: bool,
                   deep_cache=None, return_cache=False):
        """With return_cache (DeepCache refresh step): both evals run FULL
        (exact Heun) and the returned cache is the latest eval's — closest
        in time to the cached steps that follow. With deep_cache (cached
        step): both evals reuse the stored deep feature."""
        e = self.edm
        eps = e.S_noise * jax.random.normal(key, x.shape, jnp.float32)
        sigma_hat = sigma + gamma * sigma
        x_hat = x + jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)) * eps

        kw = {}
        if return_cache:
            kw = dict(return_cache=True)
        elif deep_cache is not None:
            kw = dict(deep_cache=deep_cache)
        den = self.precond_denoise(params, x_hat, sigma_hat, cond, class_label,
                                   mode, scale, clamp, **kw)
        cache = None
        if return_cache:
            den, cache = den
        d = (x_hat - den) / sigma_hat
        x_next = x_hat + (sigma_next - sigma_hat) * d
        if second_order:
            den2 = self.precond_denoise(params, x_next, sigma_next, cond,
                                        class_label, mode, scale, clamp, **kw)
            if return_cache:
                den2, cache = den2
            d2 = (x_next - den2) / sigma_next
            x_next = x_hat + 0.5 * (sigma_next - sigma_hat) * (d + d2)
            d = d2  # reference's x0 capture stores d' on Heun steps (2294-2296)
        return (x_next, d, cache) if return_cache else (x_next, d)

    def sample_org(self, params, rng, condition_x, class_label=None, *,
                   cond_scale=1.0, guidance_start_steps=0, class_cond_scale=1.0,
                   class_guidance_start_steps=0, generation_start_steps=0,
                   num_sample_steps=None, clamp=True, zero_init=False,
                   capture_trajectory=False, capture_x0=False):
        """capture_trajectory / capture_x0: the reference's with_images /
        with_x0_images (model.py:2245-2250, 2290-2296): frame stacks in
        [-1,1] with frame 0 = the init canvas; x0 frames hold
        denoised_over_sigma (d; d' on Heun steps) — a reference quirk."""
        n = num_sample_steps or self.num_sample_steps
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        cond = normalize_to_neg_one_to_one(condition_x)
        sig_np, gam_np = self.sigmas_gammas(n)
        sig, gam = jnp.asarray(sig_np), jnp.asarray(gam_np)

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            img = self.noised_at_step(init_key, cond, sig, generation_start_steps)
        elif zero_init:
            img = jnp.zeros_like(cond)
        else:
            img = sig[0] * jax.random.normal(init_key, cond.shape, jnp.float32)
        init_img = img

        def scale_at(i):
            cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
            ccs = jnp.where(i < class_guidance_start_steps, 1.0, class_cond_scale)
            return cs if mode == GUIDANCE_COND else ccs

        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        start = generation_start_steps
        if dc:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask_np = refresh_mask(self.deep_cache_schedule, dc, n - start)
            dc_mask = jnp.asarray(dc_mask_np)

        def step(carry, i):
            img, cache = carry if dc else (carry, None)
            key = jax.random.fold_in(rng, i)
            hs = dict(second_order=True)
            if dc:
                refresh = dc_mask[i - start]
                img, dd, cache = jax.lax.cond(
                    refresh,
                    lambda a: self._heun_step(
                        params, a[0], key, sig[i], sig[i + 1], gam[i], cond,
                        class_label, mode, scale_at(i), clamp,
                        return_cache=True, **hs),
                    lambda a: self._heun_step(
                        params, a[0], key, sig[i], sig[i + 1], gam[i], cond,
                        class_label, mode, scale_at(i), clamp,
                        deep_cache=a[1], **hs) + (a[1],),
                    (img, cache))
            else:
                img, dd = self._heun_step(params, img, key, sig[i], sig[i + 1],
                                          gam[i], cond, class_label, mode,
                                          scale_at(i), clamp, **hs)
            return ((img, cache) if dc else img), (
                img if capture_trajectory else None,
                dd if capture_x0 else None)

        # steps 0..n-2 are Heun (sigma_next > 0); final step n-1 is Euler-only
        traj = x0_traj = None
        carry = img
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            carry = (img, cache_zeros(self.net, self.deep_cache_depth,
                                      img.shape[0], img.shape[1],
                                      img.shape[2], mode))
        if start < n - 1:
            carry, (traj, x0_traj) = jax.lax.scan(step, carry,
                                                  jnp.arange(start, n - 1))
        img, cache = carry if dc else (carry, None)
        i_last = n - 1
        key = jax.random.fold_in(rng, i_last)
        # final Euler step: the refresh schedule position is static here
        last_kw = {}
        if dc and not dc_mask_np[i_last - start]:
            last_kw = dict(deep_cache=cache)
        out_last = self._heun_step(params, img, key, sig[i_last],
                                   sig[i_last + 1], gam[i_last], cond,
                                   class_label, mode, scale_at(i_last),
                                   clamp, second_order=False, **last_kw)
        img, dd_last = out_last[:2]

        out = unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))
        rets = (out,)
        if capture_trajectory:
            frames = [init_img[None]] + ([traj] if traj is not None else []) \
                + [img[None]]
            rets += (jnp.concatenate(frames),)
        if capture_x0:
            frames = [init_img[None]] + ([x0_traj] if x0_traj is not None
                                         else []) + [dd_last[None]]
            rets += (jnp.concatenate(frames),)
        return rets if len(rets) > 1 else out

    # ------------------------------------------------------------------
    # DPM-Solver++(2M). Parity: model.py:2478-2557.
    # ------------------------------------------------------------------
    def sample_using_dpmpp(self, params, rng, condition_x, class_label=None, *,
                           cond_scale=1.0, guidance_start_steps=0,
                           class_cond_scale=1.0, class_guidance_start_steps=0,
                           generation_start_steps=0, num_sample_steps=None,
                           clamp=True, zero_init=False,
                           capture_trajectory=False, capture_x0=False):
        """capture_x0 frames hold denoised_d (model.py:2546-2547)."""
        n = num_sample_steps or self.num_sample_steps
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        cond = normalize_to_neg_one_to_one(condition_x)
        sig_np, _ = self.sigmas_gammas(n)
        sig = jnp.asarray(sig_np)

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            img = self.noised_at_step(init_key, cond, sig, generation_start_steps)
        elif zero_init:
            img = jnp.zeros_like(cond)
        else:
            img = sig[0] * jax.random.normal(init_key, cond.shape, jnp.float32)
        init_img = img

        t_fn = lambda s: -jnp.log(s)
        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        gss = generation_start_steps

        def step(carry, i):
            img, old_denoised = carry[:2]
            cache = carry[2] if dc else None
            cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
            ccs = jnp.where(i < class_guidance_start_steps, 1.0, class_cond_scale)
            scale = cs if mode == GUIDANCE_COND else ccs
            if dc:
                refresh = ((i - gss) % dc) == 0
                denoised, cache = jax.lax.cond(
                    refresh,
                    lambda a: self.precond_denoise(
                        params, a[0], sig[i], cond, class_label, mode, scale,
                        clamp, return_cache=True),
                    lambda a: (self.precond_denoise(
                        params, a[0], sig[i], cond, class_label, mode, scale,
                        clamp, deep_cache=a[1]), a[1]),
                    (img, cache))
            else:
                denoised = self.precond_denoise(params, img, sig[i], cond,
                                                class_label, mode, scale, clamp)
            t, t_next = t_fn(sig[i]), t_fn(jnp.maximum(sig[i + 1], 1e-20))
            h = t_next - t
            prev = jnp.maximum(i - 1, 0)
            h_last = t - t_fn(sig[prev])
            r = h_last / h
            gamma = -1.0 / (2.0 * r)
            denoised_d2 = (1 - gamma) * denoised + gamma * old_denoised
            use_plain = jnp.logical_or(i == generation_start_steps,
                                       sig[i + 1] == 0)
            denoised_d = jnp.where(use_plain, denoised, denoised_d2)
            # sigma_fn(t_next)/sigma_fn(t) = sig[i+1]/sig[i]
            img = (sig[i + 1] / sig[i]) * img - jnp.expm1(-h) * denoised_d
            out_carry = (img, denoised, cache) if dc else (img, denoised)
            return out_carry, (img if capture_trajectory else None,
                               denoised_d if capture_x0 else None)

        idxs = jnp.arange(generation_start_steps, n)
        carry = (img, jnp.zeros_like(img))
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            carry = carry + (cache_zeros(self.net, self.deep_cache_depth,
                                         img.shape[0], img.shape[1],
                                         img.shape[2], mode),)
        carry, (traj, x0_traj) = jax.lax.scan(step, carry, idxs)
        img = carry[0]
        out = unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))
        rets = (out,)
        if capture_trajectory:
            rets += (jnp.concatenate([init_img[None], traj]),)
        if capture_x0:
            rets += (jnp.concatenate([init_img[None], x0_traj]),)
        return rets if len(rets) > 1 else out

    # ------------------------------------------------------------------
    def sample(self, params, rng, condition_x, class_label=None, **kw):
        """Dispatch DPM++ vs Heun (parity: model.py:2196-2209)."""
        if self.use_dpmpp_solver:
            return self.sample_using_dpmpp(params, rng, condition_x,
                                           class_label, **kw)
        return self.sample_org(params, rng, condition_x, class_label, **kw)

    # ------------------------------------------------------------------
    # Tiled Heun sampler. Parity: model.py:2308-2475.
    # ------------------------------------------------------------------
    def tiled_sample(self, params, rng, condition_x, class_label=None, *,
                     batch_size: int = 4, tile_size: int = 256,
                     tile_stride: Optional[int] = None,
                     cond_scale=1.0, guidance_start_steps=0,
                     class_cond_scale=1.0, class_guidance_start_steps=0,
                     generation_start_steps=0, num_sample_steps=None,
                     clamp=True, zero_init=False, start_white_noise=True,
                     capture_trajectory=False, capture_x0=False,
                     host_loop=False):
        """capture_trajectory / capture_x0: per-step frame stacks in [-1,1],
        cropped to the output region, frame 0 = cropped init canvas. Quirk
        reproduced from the reference (model.py:2428-2433, 2464-2465): the
        "x0" frames of this family actually hold denoised_over_sigma — the
        ODE derivative d (d' on Heun steps) — not the denoised image."""
        n = num_sample_steps or self.num_sample_steps
        b, h, w, ch = condition_x.shape
        geom = make_geometry(h, w, tile_size, tile_stride)
        mode = resolve_guidance_mode(cond_scale, class_cond_scale)
        sig_np, gam_np = self.sigmas_gammas(n)
        sig, gam = jnp.asarray(sig_np), jnp.asarray(gam_np)

        cond = normalize_to_neg_one_to_one(condition_x)
        cond_padded = reflect_pad(cond, geom.pad)
        canvas_shape = cond_padded.shape

        rng, init_key = jax.random.split(rng)
        if generation_start_steps > 0:
            img = self.noised_at_step(init_key, cond_padded, sig,
                                      generation_start_steps)
        elif zero_init:
            img = jnp.zeros_like(cond_padded)
        else:
            img = sig[0] * jax.random.normal(init_key, canvas_shape, jnp.float32)

        cond_tiles, label_tiles, n_chunks, chunks, interior_mask = \
            prepare_tile_context(cond_padded, geom, b, batch_size, class_label)

        dc = self.deep_cache_interval if self.deep_cache_interval > 1 else 0
        if dc and (capture_trajectory or capture_x0):
            raise NotImplementedError(
                'deep_cache_interval > 1 with tiled debug captures is not '
                'supported (the state stack would also stack the per-tile '
                'deep-feature caches); capture with deep-cache off')

        def make_parity_step(parity: int, second_order: bool,
                             variant: str = 'std'):
            """Churn-noise the canvas, Heun-update its tiles, scatter back,
            then (odd steps) re-noise the margin.

            The reference draws eps and forms images_hat at canvas level
            before tiling (model.py:2392-2395); identical here. With
            deep-cache, 'full' steps run exact Heun and store the second
            eval's cache; 'cached' steps reuse it for both evals."""

            def pstep(params, state, ctiles, ltiles, rng, i):
                if variant != 'std':
                    img, x0c = state[0], None
                    caches = list(state[1:])
                else:
                    img, x0c = state if capture_x0 else (state, None)
                e = self.edm
                key = jax.random.fold_in(rng, i)
                key_t, key_m = jax.random.split(key)
                cs = jnp.where(i < guidance_start_steps, 1.0, cond_scale)
                ccs = jnp.where(i < class_guidance_start_steps, 1.0,
                                class_cond_scale)
                scale = cs if mode == GUIDANCE_COND else ccs

                sigma, sigma_next, gamma = sig[i], sig[i + 1], gam[i]
                eps = e.S_noise * jax.random.normal(key_t, canvas_shape,
                                                    jnp.float32)
                sigma_hat = sigma + gamma * sigma
                img_hat = img + jnp.sqrt(
                    jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)) * eps

                tiles = extract_tiles(img_hat, geom, parity)
                tiles, n_orig = pad_tiles_to_multiple(tiles, chunks[parity])

                def chunk_fn(xs, cs_, *rest):
                    if variant == 'cached':
                        cch, rest = rest[0], rest[1:]
                    lb = rest[0] if rest else None
                    kw = {}
                    if variant == 'full':
                        kw = dict(return_cache=True)
                    elif variant == 'cached':
                        kw = dict(deep_cache=cch)
                    den = self.precond_denoise(params, xs, sigma_hat, cs_, lb,
                                               mode, scale, clamp, **kw)
                    cc = None
                    if variant == 'full':
                        den, cc = den
                    d = (xs - den) / sigma_hat
                    x_next = xs + (sigma_next - sigma_hat) * d
                    if second_order:
                        den2 = self.precond_denoise(params, x_next, sigma_next,
                                                    cs_, lb, mode, scale,
                                                    clamp, **kw)
                        if variant == 'full':
                            den2, cc = den2
                        d2 = (x_next - den2) / sigma_next
                        x_next = xs + 0.5 * (sigma_next - sigma_hat) * (d + d2)
                        d = d2  # reference stores d' on Heun steps (model.py:2431)
                    if variant == 'full':
                        return x_next, cc
                    if variant == 'cached':
                        return x_next
                    return (x_next, d) if capture_x0 else x_next

                args = (tiles, ctiles)
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
                    # margin := zeros + sigmas[i]*noise (model.py:2454-2458
                    # uses get_noised_images(zeros, i) — the CURRENT step)
                    fresh = sig[i] * jax.random.normal(key_m, img.shape,
                                                       jnp.float32)
                    img = img * interior_mask + fresh * (1.0 - interior_mask)
                if variant != 'std':
                    return (img, caches[0], caches[1])
                return (img, x0c) if capture_x0 else img

            return pstep

        capture = capture_trajectory or capture_x0
        init_img = img
        state = (img, img) if capture_x0 else img

        start = generation_start_steps
        if dc:
            from srgd_tpu.diffusion.base import cache_zeros
            state = (img,) + tuple(
                cache_zeros(self.net, self.deep_cache_depth,
                            cond_tiles[p].shape[0], cond_tiles[p].shape[1],
                            cond_tiles[p].shape[2], mode)
                for p in (0, 1))
        if dc:
            from srgd_tpu.diffusion.base import refresh_mask
            dc_mask_np = refresh_mask(self.deep_cache_schedule, dc,
                                      (n - start + 1) // 2 + 1)
            dc_mask = jnp.asarray(dc_mask_np)
        dcv = lambda i: ('full' if dc_mask_np[(i - start) // 2] else 'cached') \
            if dc else 'std'

        if host_loop:
            cache_key = ('edm', geom, n, mode, cond_scale, class_cond_scale,
                         guidance_start_steps, class_guidance_start_steps,
                         tuple(chunks), tuple(n_chunks), class_label is None, b,
                         clamp, self.edm, capture_x0, dc, self.deep_cache_depth,
                         self.deep_cache_schedule)
            variants = ('full', 'cached') if dc else ('std',)
            builders = {(so, p, v): (lambda so=so, p=p, v=v:
                                     make_parity_step(p, so == 'heun', v))
                        for so in ('heun', 'final') for p in (0, 1)
                        for v in variants}
            select = lambda i: (('heun' if i < n - 1 else 'final', i % 2,
                                 dcv(i)), i % 2)
            state, frames = run_tiled_host_loop(
                self._jit_cache, cache_key, builders, select, params, state,
                cond_tiles, label_tiles, rng, range(start, n), capture)
        else:
            if dc:
                steps_pv = {(p, v): make_parity_step(p, True, v)
                            for p in (0, 1) for v in ('full', 'cached')}

                def parity_branch(p):
                    def run(state, i):
                        refresh = dc_mask[(i - start) // 2]
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

                heun = (parity_branch(0), parity_branch(1))

                def step(state, i):
                    state = jax.lax.cond(i % 2 == 0,
                                         lambda s: heun[0](s, i),
                                         lambda s: heun[1](s, i), state)
                    return state, None
            else:
                heun_fns = (make_parity_step(0, True), make_parity_step(1, True))

                def step(state, i):
                    state = jax.lax.cond(
                        i % 2 == 0,
                        lambda s: heun_fns[0](params, s, cond_tiles[0],
                                              label_tiles[0], rng, i),
                        lambda s: heun_fns[1](params, s, cond_tiles[1],
                                              label_tiles[1], rng, i),
                        state)
                    return state, (state if capture else None)

            frames = None
            if start < n - 1:
                state, frames = jax.lax.scan(step, state, jnp.arange(start, n - 1))
            i_last = n - 1
            p_last = i_last % 2
            final_fn = make_parity_step(p_last, False, dcv(i_last))
            state = final_fn(params, state, cond_tiles[p_last],
                             label_tiles[p_last], rng,
                             jnp.asarray(i_last, jnp.int32))
            if capture:
                last = jax.tree.map(lambda a: a[None], state)
                frames = last if frames is None else jax.tree.map(
                    lambda a, z: jnp.concatenate([a, z]), frames, last)

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
    # Training loss. Parity: model.py:2030-2056, 2570-2600 (cond-drop
    # probability corrected, see module docstring).
    # ------------------------------------------------------------------
    def loss(self, params, rng, img, condition_x, class_label=None, *,
             noise=None, sigmas=None):
        b = img.shape[0]
        e = self.edm
        k_s, k_n, k_d1, k_d2 = jax.random.split(rng, 4)
        x = normalize_to_neg_one_to_one(img)
        cond = normalize_to_neg_one_to_one(condition_x)

        drop_cond = jax.random.uniform(k_d1, ()) < self.cond_drop_prob
        cond = jnp.where(drop_cond, jnp.zeros_like(cond), cond)
        class_mask = None
        if class_label is not None:
            drop_class = jax.random.uniform(k_d2, ()) < self.class_cond_drop_prob
            class_mask = jnp.where(drop_class, 0.0, 1.0) * jnp.ones((b,), jnp.float32)

        if sigmas is None:
            sigmas = jnp.exp(e.P_mean + e.P_std *
                             jax.random.normal(k_s, (b,), jnp.float32))
        if noise is None:
            noise = jax.random.normal(k_n, x.shape, jnp.float32)
        sig_b = sigmas.reshape((b,) + (1,) * (x.ndim - 1))
        noised = x + sig_b * noise

        # per-sample sigma preconditioning (vs scalar in precond_denoise)
        c_in, c_skip, c_out = e.c_in(sig_b), e.c_skip(sig_b), e.c_out(sig_b)
        net_out = self.net_apply(params, c_in * noised, e.c_noise(sigmas),
                                 cond, class_label, class_mask)
        denoised = c_skip * noised + c_out * net_out

        from srgd_tpu.diffusion.continuous import _elementwise_loss
        err = _elementwise_loss(denoised, x, self.loss_type)
        losses = jnp.mean(err.reshape(b, -1), axis=1) * e.loss_weight(sigmas)
        return jnp.mean(losses)
