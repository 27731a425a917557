"""Noise schedules for all three diffusion families.

Discrete beta tables are built host-side in numpy float64 and cast to float32,
matching the reference's float64 buffer construction then ``.to(torch.float32)``
registration (/root/reference/model.py:744-778, 859-885). Continuous-time log-SNR
functions run in float32 inside jit, matching the reference's fp32 tensor math
(model.py:2629-2636). EDM sigma schedule + preconditioners implement the standard
Karras et al. formulas the reference inherits from its pinned library
(SURVEY.md section 2.11).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Discrete beta schedules (DDPM family). float64 tables, float32 outputs.
# Parity: /root/reference/model.py:744-778.
# ---------------------------------------------------------------------------

def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(timesteps: int, start: float = -3, end: float = 3,
                          tau: float = 1, clamp_min: float = 1e-5) -> np.ndarray:
    def _sigmoid(x):
        return 1 / (1 + np.exp(-x))

    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    alphas_cumprod = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


BETA_SCHEDULES = {
    'linear': linear_beta_schedule,
    'cosine': cosine_beta_schedule,
    'sigmoid': sigmoid_beta_schedule,
}


@dataclass(frozen=True)
class DiscreteSchedule:
    """All DDPM/DDIM buffers, float32, shape (T,).

    Matches the buffers the reference re-registers locally
    (/root/reference/model.py:859-907).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray
    num_timesteps: int


def make_discrete_schedule(beta_schedule: str, timesteps: int, objective: str,
                           min_snr_loss_weight: bool = False,
                           min_snr_gamma: float = 5.0) -> DiscreteSchedule:
    if beta_schedule not in BETA_SCHEDULES:
        raise ValueError(f'unknown beta schedule {beta_schedule}')
    betas = BETA_SCHEDULES[beta_schedule](timesteps)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    # Deliberately computed without warnings: schedules where alphas_cumprod
    # reaches exactly 1.0 at t=0 (e.g. cosine after beta clipping) make
    # snr[0] = inf (and pred_noise loss_weight[0] = inf/inf = nan), and
    # near-zero alphas_cumprod[T-1] can overflow the recip tables. The
    # reference's float64 torch buffers hold the exact same inf/nan entries
    # (torch just doesn't warn). The samplers never read the affected
    # entries: posterior coefs/variance are read at t where the ancestral
    # update uses them with nonzero weight, loss_weight is finite except at
    # the degenerate boundary index, and the recip tables are finite for
    # every t the DDIM/ancestral index math produces (pinned against a
    # torch recomputation in tests/test_schedules.py).
    with np.errstate(divide='ignore', invalid='ignore', over='ignore'):
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

        snr = alphas_cumprod / (1 - alphas_cumprod)
        maybe_clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
        if objective == 'pred_noise':
            loss_weight = maybe_clipped_snr / snr
        elif objective == 'pred_x0':
            loss_weight = maybe_clipped_snr
        elif objective == 'pred_v':
            loss_weight = maybe_clipped_snr / (snr + 1)
        else:
            raise ValueError(f'unknown objective {objective}')

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return DiscreteSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            loss_weight=f32(loss_weight),
            num_timesteps=int(timesteps),
        )


# ---------------------------------------------------------------------------
# Continuous-time log-SNR schedules (VDM family).
# Parity: /root/reference/model.py:2629-2636.
# ---------------------------------------------------------------------------

def _safe_log(t, eps=1e-20):
    return jnp.log(jnp.maximum(t, eps))


def beta_linear_log_snr(t):
    """-log(expm1(1e-4 + 10 t^2)); approximates the linear beta schedule."""
    return -_safe_log(jnp.expm1(1e-4 + 10 * (t ** 2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    return -_safe_log(jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2 - 1, eps=1e-5)


LOG_SNR_SCHEDULES = {
    'linear': beta_linear_log_snr,
    'cosine': alpha_cosine_log_snr,
}


def log_snr_to_alpha_sigma(log_snr):
    """alpha = sqrt(sigmoid(logSNR)), sigma = sqrt(sigmoid(-logSNR))."""
    alpha = jnp.sqrt(jax_sigmoid(log_snr))
    sigma = jnp.sqrt(jax_sigmoid(-log_snr))
    return alpha, sigma


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


# ---------------------------------------------------------------------------
# Learned monotonic log-SNR schedule (VDM appendix H / I.2).
# Parity: /root/reference/model.py:2614-2676 — MonotonicLinear applies |W|,|b|;
# the net is x -> mono(1,1) -> residual(mono(1,h) -> sigmoid -> mono(h,1)),
# normalized to [log_snr_max, log_snr_min] via f(0), f(1) endpoints, with a
# frac_gradient straight-through mix.
# ---------------------------------------------------------------------------

def init_learned_log_snr(rng, hidden_dim: int = 1024):
    """Random init matching torch nn.Linear defaults (uniform +-1/sqrt(fan_in))."""
    import jax
    k1, k2, k3 = jax.random.split(rng, 3)

    def lin(key, fan_in, shape_w, shape_b):
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(key)
        return {'kernel': jax.random.uniform(kw, shape_w, jnp.float32, -bound, bound),
                'bias': jax.random.uniform(kb, shape_b, jnp.float32, -bound, bound)}

    return {'l1': lin(k1, 1, (1, 1), (1,)),
            'l2': lin(k2, 1, (1, hidden_dim), (hidden_dim,)),
            'l3': lin(k3, hidden_dim, (hidden_dim, 1), (1,))}


def learned_log_snr(params, t, *, frac_gradient: float = 1.0):
    """t: any shape. Params kernels are (in, out) (converter transposes torch)."""
    import jax

    def mono(p, x):
        return x @ jnp.abs(p['kernel']) + jnp.abs(p['bias'])

    def f(x):
        x = x[..., None]
        a = mono(params['l1'], x)
        r = a + mono(params['l3'], jax.nn.sigmoid(mono(params['l2'], a)))
        return r[..., 0]

    log_snr_max = float(-np.log(np.expm1(1e-4)))          # beta_linear at t=0
    log_snr_min = float(-np.log(np.expm1(1e-4 + 10.0)))   # beta_linear at t=1
    slope = log_snr_min - log_snr_max
    t = jnp.asarray(t, jnp.float32)
    out0 = f(jnp.zeros_like(t))
    out1 = f(jnp.ones_like(t))
    normed = slope * ((f(t) - out0) / (out1 - out0)) + log_snr_max
    if frac_gradient == 1.0:
        return normed
    return normed * frac_gradient + jax.lax.stop_gradient(normed) * (1 - frac_gradient)


def make_log_snr_table(noise_schedule: str, times: np.ndarray) -> np.ndarray:
    """Precompute log-SNR at fixed sampling times in float64 (host-side).

    The reference evaluates the schedule in fp32 inside the loop; since
    sampling times are a static linspace we can do better: exact f64 tables,
    cast once to f32. Removes XLA-vs-torch fp32 transcendental drift from the
    0.1 dB parity budget (SURVEY.md section 7 'hard parts')."""
    t = np.asarray(times, dtype=np.float64)
    if noise_schedule == 'linear':
        vals = -np.log(np.maximum(np.expm1(1e-4 + 10 * t ** 2), 1e-20))
    elif noise_schedule == 'cosine':
        s = 0.008
        vals = -np.log(np.maximum(np.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2 - 1, 1e-5))
    else:
        raise ValueError(f'unknown noise schedule {noise_schedule}')
    return vals.astype(np.float32)


# ---------------------------------------------------------------------------
# EDM (Karras) schedule + preconditioners.
# Standard formulas inherited by the reference from its pinned library
# (SURVEY.md section 2.11; used at /root/reference/model.py:1802-1832).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EDMParams:
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_noise: float = 1.003

    def c_skip(self, sigma):
        return (self.sigma_data ** 2) / (sigma ** 2 + self.sigma_data ** 2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def c_noise(self, sigma):
        return 0.25 * jnp.log(sigma)

    def loss_weight(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) / ((sigma * self.sigma_data) ** 2)

    def sample_schedule(self, num_sample_steps: int) -> np.ndarray:
        """Karras rho-schedule, N sigmas descending from sigma_max to sigma_min,
        with a trailing 0. Shape (N+1,), float32 (host-side numpy)."""
        n = num_sample_steps
        inv_rho = 1.0 / self.rho
        steps = np.arange(n, dtype=np.float32)
        sigmas = (self.sigma_max ** inv_rho
                  + steps / (n - 1) * (self.sigma_min ** inv_rho - self.sigma_max ** inv_rho)) ** self.rho
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def gammas(self, sigmas: np.ndarray, num_sample_steps: int) -> np.ndarray:
        """Per-step churn factors (model.py:1872-1877)."""
        g = min(self.S_churn / num_sample_steps, math.sqrt(2) - 1)
        return np.where((sigmas >= self.S_tmin) & (sigmas <= self.S_tmax), g, 0.0).astype(np.float32)
