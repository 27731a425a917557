"""End-to-end golden parity: srgd-tpu's continuous-time sampler (jax, scan,
converted weights) vs an independent torch re-derivation of the shipped
sampler math, with identical injected noise.

This is the strongest cross-framework evidence available without the
reference's uninstalled libraries: it exercises the U-Net (through the
checkpoint converter), the log-SNR schedule, the ancestral update, CFG, and
the clamp semantics together, at small scale. Target tolerance mirrors the
0.1 dB PSNR budget (SURVEY.md section 6)."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from srgd_tpu.checkpoint.torch_convert import convert_unet_state_dict
from srgd_tpu.diffusion.continuous import ContinuousDiffusion
from srgd_tpu.nn.unet import SRUnet
from tests.torch_ref import make_state_dict, unet_forward


def _torch_continuous_sample(sd, cond01, init_noise, step_noises, *, dim,
                             dim_mults, full_attn, n_steps, class_label=None,
                             class_cond_scale=1.0):
    """Shipped-family ancestral sampler re-derived in torch
    (math of /root/reference/model.py:3122-3246)."""
    cond = torch.from_numpy(cond01).permute(0, 3, 1, 2) * 2 - 1
    img = torch.from_numpy(init_noise).permute(0, 3, 1, 2)
    steps = np.linspace(1.0, 0.0, n_steps + 1)

    def log_snr(t):
        return -math.log(max(math.expm1(1e-4 + 10 * t * t), 1e-20))

    def net(x, ls, label):
        t = torch.full((x.shape[0],), ls, dtype=torch.float32)
        lab = None if label is None else torch.as_tensor(label)
        return unet_forward(sd, x, t, class_label=lab, cond=cond, dim=dim,
                            dim_mults=dim_mults, full_attn=full_attn)

    for i in range(n_steps):
        ls, ls_next = log_snr(steps[i]), log_snr(steps[i + 1])
        c = -math.expm1(ls - ls_next)
        alpha = math.sqrt(1 / (1 + math.exp(-ls)))
        sigma = math.sqrt(1 / (1 + math.exp(ls)))
        alpha_next = math.sqrt(1 / (1 + math.exp(-ls_next)))
        sq_sigma_next = 1 / (1 + math.exp(ls_next))

        if class_cond_scale == 1.0:
            eps = net(img, ls, class_label)
        else:
            cond_out = net(img, ls, class_label)
            null_out = net(img, ls, None)
            eps = null_out + (cond_out - null_out) * class_cond_scale

        x0 = torch.clamp((img - sigma * eps) / alpha, -1, 1)
        mean = alpha_next * (img * (1 - c) / alpha + c * x0)
        var = sq_sigma_next * c
        if i == n_steps - 1:
            img = mean
        else:
            noise = torch.from_numpy(step_noises[i]).permute(0, 3, 1, 2)
            img = mean + math.sqrt(var) * noise

    img = torch.clamp(img, -1, 1)
    return ((img + 1) * 0.5).permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize('class_cond_scale', [1.0, 2.0])
def test_e2e_sampler_parity(class_cond_scale):
    dim, dim_mults, full_attn = 8, (1, 2), (False, True)
    n_steps = 6
    torch.manual_seed(0)
    sd = make_state_dict(dim=dim, dim_mults=dim_mults, full_attn=full_attn,
                         num_classes=3, learned_sinusoidal_dim=8, seed=0)
    params, _ = convert_unet_state_dict({k: v.numpy() for k, v in sd.items()},
                                        num_stages=2)

    rng = np.random.default_rng(0)
    cond01 = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    init_noise = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    step_noises = rng.normal(size=(n_steps, 1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([1])

    net = SRUnet(dim=dim, dim_mults=dim_mults, full_attn=full_attn,
                 learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                 num_classes=3)
    d = ContinuousDiffusion(net=net, image_size=16, num_sample_steps=n_steps)
    ours = d.sample({'params': params}, jax.random.PRNGKey(0),
                    jnp.asarray(cond01), jnp.asarray(label),
                    class_cond_scale=class_cond_scale,
                    init_noise=jnp.asarray(init_noise),
                    step_noises=jnp.asarray(step_noises))
    ours = np.asarray(ours)

    with torch.no_grad():
        theirs = _torch_continuous_sample(
            sd, cond01, init_noise, step_noises, dim=dim, dim_mults=dim_mults,
            full_attn=full_attn, n_steps=n_steps, class_label=label,
            class_cond_scale=class_cond_scale)

    # pixel space [0,1]: these bounds correspond to PSNR >> 60 dB agreement
    assert ours.shape == theirs.shape
    max_err = np.abs(ours - theirs).max()
    mse = np.mean((ours - theirs) ** 2)
    psnr = -10 * np.log10(max(mse, 1e-20))
    assert max_err < 5e-4, (max_err, psnr)
    assert psnr > 60, psnr
