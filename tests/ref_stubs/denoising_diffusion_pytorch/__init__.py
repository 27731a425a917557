"""Import stub for the pinned `denoising-diffusion-pytorch==1.8.15` surface
the reference inherits (VERDICT r2 missing #1 / SURVEY.md section 2.11).

The reference's model.py subclasses three classes from this library but
rebuilds or re-registers nearly everything locally:

- ``SRUnet``/``ConditionalSRUnet`` overwrite every submodule after
  ``super().__init__`` (/root/reference/model.py:396-487, 556-676); the base
  only needs to accept the constructor args and expose ``downsample_factor``.
- ``GaussianDiffusionSR`` re-registers ALL schedule buffers locally
  (model.py:859-906) and overrides model_predictions / p_mean_variance /
  all samplers / p_losses; the base contributes the buffer-reading helper
  formulas (q_sample, q_posterior, predict_*) and normalize/unnormalize.
- ``ElucidatedDiffusionSR`` re-assigns every EDM parameter locally
  (model.py:1780-1798) and overrides all sampling; the base contributes the
  EDM preconditioning scalars (c_skip/c_out/c_in/c_noise), the Karras rho
  sample_schedule, loss_weight and noise_distribution.

The formulas below are the standard DDPM/EDM ones the pinned library
implements (SURVEY.md section 2.11 pins each). This stub exists so the
REFERENCE'S OWN 3,667-line model.py executes as the golden side of parity
tests (tests/test_reference_golden.py) instead of a same-author torch
re-derivation.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def exists(x):
    return x is not None


def default(val, d):
    if exists(val):
        return val
    return d() if callable(d) else d


def identity(t, *args, **kwargs):
    return t


def extract(a, t, x_shape):
    b, *_ = t.shape
    out = a.gather(-1, t)
    return out.reshape(b, *((1,) * (len(x_shape) - 1)))


def normalize_to_neg_one_to_one(img):
    return img * 2 - 1


def unnormalize_to_zero_to_one(t):
    return (t + 1) * 0.5


class Unet(nn.Module):
    """Constructor-compatible base; SRUnet/ConditionalSRUnet overwrite every
    submodule it would build (model.py:396-487), so it builds nothing."""

    def __init__(self, dim, init_dim=None, out_dim=None, dim_mults=(1, 2, 4, 8),
                 channels=3, self_condition=False, resnet_block_groups=8,
                 learned_variance=False, learned_sinusoidal_cond=False,
                 random_fourier_features=False, learned_sinusoidal_dim=16,
                 sinusoidal_pos_emb_theta=10000, dropout=0.0,
                 attn_dim_head=32, attn_heads=4, full_attn=None,
                 flash_attn=False):
        super().__init__()
        self.channels = channels
        self.self_condition = self_condition
        self.random_or_learned_sinusoidal_cond = (
            learned_sinusoidal_cond or random_fourier_features)
        self.downs = nn.ModuleList([])
        self.ups = nn.ModuleList([])

    @property
    def downsample_factor(self):
        # 2**(len(downs)-1): model.py:489/679 input-divisibility assert
        return 2 ** (len(self.downs) - 1)


class GaussianDiffusion(nn.Module):
    """Buffer-reading helpers over schedule buffers the SUBCLASS registers
    (model.py:859-906); formulas are the standard DDPM set (SURVEY 2.11)."""

    def __init__(self, model=None, *, image_size=None, timesteps=1000,
                 sampling_timesteps=None, objective='pred_v',
                 beta_schedule='sigmoid', schedule_fn_kwargs=None,
                 ddim_sampling_eta=0., auto_normalize=True,
                 offset_noise_strength=0., min_snr_loss_weight=False,
                 min_snr_gamma=5, immiscible=False):
        super().__init__()
        self.model = model
        self.image_size = image_size
        self.objective = objective
        # auto_normalize: [0,1] <-> [-1,1] shims (lib 1.8.15 behavior)
        self.normalize = (normalize_to_neg_one_to_one if auto_normalize
                          else identity)
        self.unnormalize = (unnormalize_to_zero_to_one if auto_normalize
                            else identity)

    @property
    def device(self):
        return self.betas.device

    def predict_start_from_noise(self, x_t, t, noise):
        return (extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                - extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)
                * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        return ((extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                 - x0)
                / extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape))

    def predict_v(self, x_start, t, noise):
        return (extract(self.sqrt_alphas_cumprod, t, x_start.shape) * noise
                - extract(self.sqrt_one_minus_alphas_cumprod, t,
                          x_start.shape) * x_start)

    def predict_start_from_v(self, x_t, t, v):
        return (extract(self.sqrt_alphas_cumprod, t, x_t.shape) * x_t
                - extract(self.sqrt_one_minus_alphas_cumprod, t,
                          x_t.shape) * v)

    def q_posterior(self, x_start, x_t, t):
        posterior_mean = (
            extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + extract(self.posterior_mean_coef2, t, x_t.shape) * x_t)
        posterior_variance = extract(self.posterior_variance, t, x_t.shape)
        posterior_log_variance_clipped = extract(
            self.posterior_log_variance_clipped, t, x_t.shape)
        return (posterior_mean, posterior_variance,
                posterior_log_variance_clipped)

    def q_sample(self, x_start, t, noise=None):
        noise = default(noise, lambda: torch.randn_like(x_start))
        return (extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
                + extract(self.sqrt_one_minus_alphas_cumprod, t,
                          x_start.shape) * noise)


class ElucidatedDiffusion(nn.Module):
    """EDM preconditioning + Karras schedule (Karras et al. 2022, the pinned
    library's formulas; SURVEY 2.11). The subclass re-assigns every sigma /
    S_* parameter after super().__init__ (model.py:1780-1798)."""

    def __init__(self, net=None, *, image_size=None, channels=3,
                 num_sample_steps=32, sigma_min=0.002, sigma_max=80,
                 sigma_data=0.5, rho=7, P_mean=-1.2, P_std=1.2,
                 S_churn=80, S_tmin=0.05, S_tmax=50, S_noise=1.003):
        super().__init__()
        self.net = net
        self.image_size = image_size
        self.channels = channels
        self.num_sample_steps = num_sample_steps
        self.sigma_min, self.sigma_max, self.sigma_data = (
            sigma_min, sigma_max, sigma_data)
        self.rho = rho
        self.P_mean, self.P_std = P_mean, P_std
        self.S_churn, self.S_tmin, self.S_tmax, self.S_noise = (
            S_churn, S_tmin, S_tmax, S_noise)

    @property
    def device(self):
        return next(self.net.parameters()).device

    def c_skip(self, sigma):
        return (self.sigma_data ** 2) / (sigma ** 2 + self.sigma_data ** 2)

    def c_out(self, sigma):
        return sigma * self.sigma_data * (self.sigma_data ** 2
                                          + sigma ** 2) ** -0.5

    def c_in(self, sigma):
        return 1 * (sigma ** 2 + self.sigma_data ** 2) ** -0.5

    def c_noise(self, sigma):
        return torch.log(sigma) * 0.25

    def loss_weight(self, sigma):
        return ((sigma ** 2 + self.sigma_data ** 2)
                * (sigma * self.sigma_data) ** -2)

    def noise_distribution(self, batch_size):
        return (self.P_mean
                + self.P_std * torch.randn((batch_size,),
                                           device=self.device)).exp()

    def sample_schedule(self, num_sample_steps=None):
        num_sample_steps = default(num_sample_steps, self.num_sample_steps)
        N = num_sample_steps
        inv_rho = 1 / self.rho
        steps = torch.arange(num_sample_steps, device=self.device,
                             dtype=torch.float32)
        sigmas = (self.sigma_max ** inv_rho
                  + steps / (N - 1)
                  * (self.sigma_min ** inv_rho
                     - self.sigma_max ** inv_rho)) ** self.rho
        sigmas = F.pad(sigmas, (0, 1), value=0.)  # sigma_N = 0
        return sigmas
