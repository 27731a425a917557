"""Validation metrics: PSNR and SSIM (jittable).

The reference's config names val PSNR/SSIM/LPIPS targets (config.py:181) but
ships no metric code (SURVEY.md section 5.5); these cover the PSNR/SSIM
surface. Inputs are (B, H, W, C) in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a, b, max_val: float = 1.0):
    """Per-batch mean PSNR in dB."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return jnp.mean(20 * jnp.log10(max_val) - 10 * jnp.log10(jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(a, b, max_val: float = 1.0, size: int = 11, sigma: float = 1.5):
    """Mean SSIM (Wang et al.), valid-window convolution, per-channel mean."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = _gaussian_kernel(size, sigma)[:, :, None, None]

    def filt(x):
        # depthwise valid conv per channel
        b_, h, w, c = x.shape
        xt = x.transpose(0, 3, 1, 2).reshape(b_ * c, 1, h, w)
        y = jax.lax.conv_general_dilated(
            xt, win.transpose(2, 3, 0, 1), (1, 1), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        hh, ww = y.shape[-2:]
        return y.reshape(b_, c, hh, ww).transpose(0, 2, 3, 1)

    mu_a, mu_b = filt(a), filt(b)
    sa = filt(a * a) - mu_a ** 2
    sb = filt(b * b) - mu_b ** 2
    sab = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2)
    return jnp.mean(num / den)
