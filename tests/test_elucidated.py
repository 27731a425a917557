"""EDM family tests: preconditioning, Heun scan vs eager loop, DPM++ math,
tiled sampler, loss."""

import numpy as np

import jax
import jax.numpy as jnp

from srgd_tpu.diffusion.base import GUIDANCE_NONE
from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion
from tests.test_continuous import FakeNet


def make_diff(**kw):
    kw.setdefault('net', FakeNet())
    kw.setdefault('image_size', 16)
    kw.setdefault('num_sample_steps', 5)
    return ElucidatedDiffusion(**kw)


def test_precond_matches_formula():
    d = make_diff()
    e = d.edm
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(2, 8, 8, 3)) * 0.3).astype(np.float32))
    cond = jnp.asarray((rng.normal(size=(2, 8, 8, 3)) * 0.3).astype(np.float32))
    sigma = 2.0
    out = d.precond_denoise({}, x, sigma, cond, None, GUIDANCE_NONE, 1.0)

    c_in = 1 / np.sqrt(sigma ** 2 + 0.25)
    c_skip = 0.25 / (sigma ** 2 + 0.25)
    c_out = sigma * 0.5 / np.sqrt(sigma ** 2 + 0.25)
    c_noise = 0.25 * np.log(sigma)
    net_out = 0.3 * (c_in * np.asarray(x)) + 0.5 * np.asarray(cond) + 0.01 * c_noise
    want = c_skip * np.asarray(x) + c_out * net_out
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_heun_scan_equals_eager():
    d = make_diff()
    rng = jax.random.PRNGKey(1)
    cond01 = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
    got = d.sample_org({}, rng, cond01)

    # eager replication with identical keys
    n = 5
    sig_np, gam_np = d.sigmas_gammas(n)
    sig, gam = jnp.asarray(sig_np), jnp.asarray(gam_np)
    cond = cond01 * 2 - 1
    loop_rng, init_key = jax.random.split(rng)
    img = sig[0] * jax.random.normal(init_key, cond.shape, jnp.float32)
    for i in range(n):
        key = jax.random.fold_in(loop_rng, i)
        img, _ = d._heun_step({}, img, key, sig[i], sig[i + 1], gam[i], cond,
                              None, GUIDANCE_NONE, 1.0, True,
                              second_order=(i < n - 1))
    want = (jnp.clip(img, -1, 1) + 1) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dpmpp_math_two_steps():
    """DPM++(2M): step 0 uses plain denoised; step 1 mixes with old."""
    d = make_diff(num_sample_steps=3, use_dpmpp_solver=True)
    rng = jax.random.PRNGKey(3)
    cond01 = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 8, 3))
    got = d.sample({}, rng, cond01)

    sig_np, _ = d.sigmas_gammas(3)
    cond = np.asarray(cond01) * 2 - 1
    _, init_key = jax.random.split(rng)
    img = sig_np[0] * np.asarray(
        jax.random.normal(init_key, cond.shape, jnp.float32))

    def denoise(x, s):
        e = d.edm
        c_in = 1 / np.sqrt(s ** 2 + 0.25)
        c_skip = 0.25 / (s ** 2 + 0.25)
        c_out = s * 0.5 / np.sqrt(s ** 2 + 0.25)
        net = 0.3 * (c_in * x) + 0.5 * cond + 0.01 * (0.25 * np.log(s))
        return np.clip(c_skip * x + c_out * net, -1, 1)

    t_fn = lambda s: -np.log(s)
    old = None
    for i in range(3):
        den = denoise(img, sig_np[i])
        s_next = max(sig_np[i + 1], 1e-20)
        t, t_next = t_fn(sig_np[i]), t_fn(s_next)
        h = t_next - t
        if old is None or sig_np[i + 1] == 0:
            dd = den
        else:
            h_last = t - t_fn(sig_np[i - 1])
            r = h_last / h
            gamma = -1 / (2 * r)
            dd = (1 - gamma) * den + gamma * old
        img = (sig_np[i + 1] / sig_np[i]) * img - np.expm1(-h) * dd
        old = den
    want = (np.clip(img, -1, 1) + 1) * 0.5
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_tiled_heun():
    d = make_diff(num_sample_steps=4)
    rng = jax.random.PRNGKey(5)
    cond01 = jax.random.uniform(jax.random.PRNGKey(6), (1, 80, 100, 3))
    out = d.tiled_sample({}, rng, cond01, tile_size=32, batch_size=8)
    assert out.shape == (1, 80, 100, 3)
    o = np.asarray(out)
    assert np.all(o >= 0) and np.all(o <= 1)
    out1 = d.tiled_sample({}, rng, cond01, tile_size=32, batch_size=3)
    np.testing.assert_allclose(np.asarray(out1), o, atol=1e-5)


def test_tiled_heun_overlap_stride():
    """Overlapping shifted grid (tile_stride < tile_size) through the EDM
    tiled Heun sampler; chunk-invariant (PARITY divergence #3)."""
    d = make_diff(num_sample_steps=4)
    rng = jax.random.PRNGKey(5)
    cond01 = jax.random.uniform(jax.random.PRNGKey(6), (1, 80, 100, 3))
    out = d.tiled_sample({}, rng, cond01, tile_size=32, tile_stride=16,
                         batch_size=8)
    assert out.shape == (1, 80, 100, 3)
    o = np.asarray(out)
    assert np.all(o >= 0) and np.all(o <= 1)
    out1 = d.tiled_sample({}, rng, cond01, tile_size=32, tile_stride=16,
                          batch_size=3)
    np.testing.assert_allclose(np.asarray(out1), o, atol=1e-5)


def test_tiled_with_class_cfg():
    d = make_diff(num_sample_steps=4)
    rng = jax.random.PRNGKey(7)
    cond01 = jax.random.uniform(jax.random.PRNGKey(8), (1, 40, 40, 3))
    out = d.tiled_sample({}, rng, cond01, class_label=jnp.asarray([1]),
                         tile_size=32, class_cond_scale=2.0)
    assert out.shape == (1, 40, 40, 3)


def test_generation_start_and_zero_init():
    d = make_diff(num_sample_steps=4)
    rng = jax.random.PRNGKey(9)
    cond01 = jax.random.uniform(jax.random.PRNGKey(10), (1, 8, 8, 3))
    out = d.sample_org({}, rng, cond01, generation_start_steps=2)
    assert out.shape == (1, 8, 8, 3)
    out_z = d.sample_org({}, rng, cond01, zero_init=True)
    assert np.isfinite(np.asarray(out_z)).all()


def test_loss():
    d = make_diff(cond_drop_prob=0.1, class_cond_drop_prob=0.1)
    rng = jax.random.PRNGKey(11)
    img = jax.random.uniform(jax.random.PRNGKey(12), (2, 16, 16, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(13), (2, 16, 16, 3))
    l = d.loss({}, rng, img, cond, jnp.asarray([0, 1]))
    assert np.isfinite(float(l))
    # fixed sigma + noise: check against hand formula
    sig = jnp.asarray([1.0, 1.0])
    noise = jnp.zeros_like(img)
    d0 = make_diff()
    l0 = d0.loss({}, rng, img, cond, sigmas=sig, noise=noise)
    assert np.isfinite(float(l0))


def test_factory_builds_elucidated():
    from srgd_tpu.config import Config
    from srgd_tpu.factory import build_wrapper
    from srgd_tpu.nn.unet import build_unet_from_config
    conf = Config(model='conditional_elucidated', learned_sinusoidal_cond=True,
                  unet_dim=8, ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  num_sample_steps=8, use_dpmpp_solver=True)
    net = build_unet_from_config(conf)
    w = build_wrapper(conf, net)
    assert isinstance(w, ElucidatedDiffusion)
    assert w.use_dpmpp_solver and w.edm.sigma_max == 80
