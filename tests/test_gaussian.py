"""Discrete Gaussian (DDPM/DDIM) family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srgd_tpu.diffusion.base import GUIDANCE_NONE
from srgd_tpu.diffusion.gaussian import GaussianDiffusion, ddim_time_pairs
from tests.test_continuous import FakeNet


def make_diff(**kw):
    kw.setdefault('net', FakeNet())
    kw.setdefault('image_size', 16)
    kw.setdefault('beta_schedule', 'cosine')  # linear at T=20 hits beta=1
    kw.setdefault('timesteps', 20)
    kw.setdefault('sampling_timesteps', 5)
    return GaussianDiffusion(**kw)


def test_ddim_time_pairs():
    pairs = ddim_time_pairs(1000, 250)
    assert pairs.shape == (250, 2)
    assert tuple(pairs[0]) == (999, 995)
    assert tuple(pairs[-1]) == (3, -1)
    pairs = ddim_time_pairs(20, 5)
    assert tuple(pairs[-1])[1] == -1
    assert tuple(pairs[0])[0] == 19


def test_x0_eps_conversion_identities():
    d = make_diff()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    t = 7
    x = d.q_sample(x0, t, eps)
    # invert: start from (x, eps) -> x0
    x0_rec = d.predict_start_from_noise(x, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = d.predict_noise_from_start(x, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-3)
    # v-parameterization roundtrip
    v = d.predict_v(x0, t, eps)
    x0_from_v = d.predict_start_from_v(x, t, v)
    np.testing.assert_allclose(np.asarray(x0_from_v), np.asarray(x0), atol=1e-4)


def test_posterior_matches_formula():
    d = make_diff()
    s = d.sched
    t = 5
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    mean, var, logvar = d.q_posterior(x0, x, t)
    want = (np.asarray(s.posterior_mean_coef1)[t] * np.asarray(x0)
            + np.asarray(s.posterior_mean_coef2)[t] * np.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), want, atol=1e-6)
    assert float(var) > 0 and np.isfinite(float(logvar))


def test_ancestral_scan_equals_eager():
    d = make_diff(sampling_timesteps=20)  # == timesteps -> ancestral
    assert not d.is_ddim_sampling
    rng = jax.random.PRNGKey(3)
    cond01 = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 8, 3))
    got = d.sample({}, rng, cond01)

    cond = cond01 * 2 - 1
    loop_rng, init_key = jax.random.split(rng)
    img = jax.random.normal(init_key, cond.shape, jnp.float32)
    for i in range(20):
        t = 20 - 1 - i
        key = jax.random.fold_in(loop_rng, i)
        noise = jax.random.normal(key, img.shape, jnp.float32)
        img, _ = d.p_sample_step({}, img, t, cond, None, noise,
                                 GUIDANCE_NONE, 1.0)
    want = (img + 1) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_ddim_terminal_returns_x0():
    d = make_diff()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    img, x0 = d.ddim_step({}, x, 3, -1, cond, None, noise, GUIDANCE_NONE, 1.0)
    np.testing.assert_allclose(np.asarray(img), np.asarray(x0), atol=1e-6)
    # and x0 is clipped
    assert np.all(np.abs(np.asarray(x0)) <= 1.0 + 1e-6)


def test_ddim_step_matches_formula():
    d = make_diff(objective='pred_noise')
    s = d.sched
    rng = np.random.default_rng(4)
    x = jnp.asarray((rng.normal(size=(1, 8, 8, 3)) * 0.1).astype(np.float32))
    cond = jnp.asarray((rng.normal(size=(1, 8, 8, 3)) * 0.1).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    time, time_next = 15, 11
    img, x0 = d.ddim_step({}, x, time, time_next, cond, None, noise,
                          GUIDANCE_NONE, 1.0)

    eps = 0.3 * np.asarray(x) + 0.5 * np.asarray(cond) + 0.01 * time
    ac = np.asarray(s.alphas_cumprod, np.float64)
    sr, srm1 = np.sqrt(1 / ac), np.sqrt(1 / ac - 1)
    x0_ref = np.clip(sr[time] * np.asarray(x) - srm1[time] * eps, -1, 1)
    eps_red = (sr[time] * np.asarray(x) - x0_ref) / srm1[time]
    c = np.sqrt(1 - ac[time_next])
    want = x0_ref * np.sqrt(ac[time_next]) + c * eps_red
    np.testing.assert_allclose(np.asarray(img), want, atol=1e-4)


@pytest.mark.parametrize('objective', ['pred_noise', 'pred_x0', 'pred_v'])
def test_objectives_sample_and_loss(objective):
    d = make_diff(objective=objective)
    rng = jax.random.PRNGKey(5)
    cond01 = jax.random.uniform(jax.random.PRNGKey(6), (1, 8, 8, 3))
    out = d.sample({}, rng, cond01)  # DDIM (5 < 20)
    assert out.shape == (1, 8, 8, 3)
    img01 = jax.random.uniform(jax.random.PRNGKey(7), (2, 16, 16, 3))
    c01 = jax.random.uniform(jax.random.PRNGKey(8), (2, 16, 16, 3))
    l = d.loss({}, rng, img01, c01)
    assert np.isfinite(float(l))


def test_tiled_ddim():
    d = make_diff()
    rng = jax.random.PRNGKey(9)
    cond01 = jax.random.uniform(jax.random.PRNGKey(10), (1, 80, 100, 3))
    out = d.tiled_sample({}, rng, cond01, tile_size=32, batch_size=8)
    assert out.shape == (1, 80, 100, 3)
    o = np.asarray(out)
    assert np.all(o >= 0) and np.all(o <= 1)
    # chunk invariance
    out1 = d.tiled_sample({}, rng, cond01, tile_size=32, batch_size=3)
    np.testing.assert_allclose(np.asarray(out1), o, atol=1e-5)


def test_tiled_ddim_overlap_stride():
    """tile_stride < tile_size: overlapping shifted grid, chunk-invariant
    by design (PARITY divergence #3 — gather-all, last-write-wins)."""
    d = make_diff()
    rng = jax.random.PRNGKey(9)
    cond01 = jax.random.uniform(jax.random.PRNGKey(10), (1, 80, 100, 3))
    out = d.tiled_sample({}, rng, cond01, tile_size=32, tile_stride=16,
                         batch_size=8)
    assert out.shape == (1, 80, 100, 3)
    o = np.asarray(out)
    assert np.all(o >= 0) and np.all(o <= 1)
    out1 = d.tiled_sample({}, rng, cond01, tile_size=32, tile_stride=16,
                          batch_size=3)
    np.testing.assert_allclose(np.asarray(out1), o, atol=1e-5)


def test_tiled_with_cfg_and_label():
    d = make_diff()
    rng = jax.random.PRNGKey(11)
    cond01 = jax.random.uniform(jax.random.PRNGKey(12), (1, 40, 40, 3))
    out = d.tiled_sample({}, rng, cond01, class_label=jnp.asarray([2]),
                         tile_size=32, cond_scale=2.0, guidance_start_steps=1)
    assert out.shape == (1, 40, 40, 3)


def test_factory_builds_gaussian():
    from srgd_tpu.config import Config
    from srgd_tpu.factory import build_wrapper
    from srgd_tpu.nn.unet import build_unet_from_config
    conf = Config(model='conditional_gaussian', learned_sinusoidal_cond=False,
                  unet_dim=8, ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  timesteps=20, sampling_timesteps=5)
    net = build_unet_from_config(conf)
    w = build_wrapper(conf, net)
    assert isinstance(w, GaussianDiffusion) and w.is_ddim_sampling
    # consistency assert fires for wrong sinusoidal setting
    conf2 = Config(model='gaussian', learned_sinusoidal_cond=True, unet_dim=8,
                   ddpm_unet_dim_mults='1,2', full_attn='False,True')
    with pytest.raises(AssertionError):
        build_wrapper(conf2, build_unet_from_config(conf2))
