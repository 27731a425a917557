"""Learned monotonic log-SNR schedule tests (VDM appendix H/I.2;
/root/reference/model.py:2614-2676)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from srgd_tpu.checkpoint.torch_convert import convert_learned_log_snr
from srgd_tpu.diffusion.continuous import ContinuousDiffusion
from srgd_tpu.diffusion.schedules import init_learned_log_snr, learned_log_snr


def test_endpoints_and_monotonicity():
    sp = init_learned_log_snr(jax.random.PRNGKey(0), hidden_dim=32)
    t = jnp.linspace(0.0, 1.0, 101)
    vals = np.asarray(learned_log_snr(sp, t))
    # normalization pins f(0) = log_snr_max, f(1) = log_snr_min
    assert vals[0] == pytest.approx(-np.log(np.expm1(1e-4)), rel=1e-4)
    assert vals[-1] == pytest.approx(-np.log(np.expm1(1e-4 + 10.0)), rel=1e-4)
    # |W|,|b| make the raw net monotonically increasing; the negative slope
    # normalization makes log-SNR decreasing in t
    assert np.all(np.diff(vals) <= 1e-5)


def test_matches_torch_formula():
    """Against a direct torch evaluation of the reference formulas."""
    torch.manual_seed(0)
    w1, b1 = torch.randn(1, 1), torch.randn(1)
    w2, b2 = torch.randn(32, 1), torch.randn(32)
    w3, b3 = torch.randn(1, 32), torch.randn(1)

    def mono(x, w, b):
        return F.linear(x, w.abs(), b.abs())

    def f(x):
        x = x[..., None]
        a = mono(x, w1, b1)
        r = a + mono(torch.sigmoid(mono(a, w2, b2)), w3, b3)
        return r[..., 0]

    import math
    lmax = -math.log(math.expm1(1e-4))
    lmin = -math.log(math.expm1(1e-4 + 10.0))
    t = torch.linspace(0, 1, 11)
    normed = (lmin - lmax) * ((f(t) - f(torch.zeros_like(t)))
                              / (f(torch.ones_like(t)) - f(torch.zeros_like(t)))) + lmax

    extras = {
        'log_snr.net.1.net.weight': w1.numpy(), 'log_snr.net.1.net.bias': b1.numpy(),
        'log_snr.net.2.fn.0.net.weight': w2.numpy(), 'log_snr.net.2.fn.0.net.bias': b2.numpy(),
        'log_snr.net.2.fn.2.net.weight': w3.numpy(), 'log_snr.net.2.fn.2.net.bias': b3.numpy(),
    }
    sp = convert_learned_log_snr(extras)
    ours = learned_log_snr(sp, jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(ours), normed.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_frac_gradient():
    sp = init_learned_log_snr(jax.random.PRNGKey(1), hidden_dim=16)
    g_full = jax.grad(lambda p: jnp.sum(learned_log_snr(p, jnp.asarray([0.5]))))(sp)
    g_half = jax.grad(lambda p: jnp.sum(
        learned_log_snr(p, jnp.asarray([0.5]), frac_gradient=0.5)))(sp)
    r = np.asarray(g_half['l2']['kernel']) / np.maximum(
        np.abs(np.asarray(g_full['l2']['kernel'])), 1e-20) * np.sign(
        np.asarray(g_full['l2']['kernel']))
    nz = np.abs(np.asarray(g_full['l2']['kernel'])) > 1e-12
    np.testing.assert_allclose(r[nz], 0.5, rtol=1e-3)


def test_sampler_with_learned_schedule():
    from tests.test_continuous import FakeNet

    class DictFakeNet(FakeNet):
        def apply(self, params, *a, **kw):
            return super().apply(params, *a, **kw)

    d = ContinuousDiffusion(net=DictFakeNet(), image_size=16,
                            noise_schedule='learned', num_sample_steps=4)
    params = {'params': {}, 'log_snr': init_learned_log_snr(
        jax.random.PRNGKey(2), hidden_dim=16)}
    cond = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
    out = d.sample(params, jax.random.PRNGKey(4), cond)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # tiled, both exec modes agree
    a = d.tiled_sample(params, jax.random.PRNGKey(5), cond, tile_size=16,
                       batch_size=4)
    b = d.tiled_sample(params, jax.random.PRNGKey(5), cond, tile_size=16,
                       batch_size=4, host_loop=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # training loss differentiable through the schedule
    img = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 3))
    grads = jax.grad(lambda p: d.loss(p, jax.random.PRNGKey(7), img, img))(params)
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads['log_snr']))))
    assert np.isfinite(gn) and gn > 0


def test_host_loop_no_stale_schedule_closure():
    """Regression: the host-loop jit cache used to key on id(params) and bake
    the learned log-SNR table into the closure — a recycled id() could serve a
    stale table. The table is now a traced argument; two different schedule
    params through the SAME wrapper/cache must give different outputs."""
    from tests.test_continuous import FakeNet

    d = ContinuousDiffusion(net=FakeNet(), image_size=16,
                            noise_schedule='learned', num_sample_steps=4)
    cond = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))

    def run(seed):
        params = {'params': {}, 'log_snr': init_learned_log_snr(
            jax.random.PRNGKey(seed), hidden_dim=16)}
        return d.tiled_sample(params, jax.random.PRNGKey(5), cond,
                              tile_size=16, batch_size=4, host_loop=True)

    out_a, out_b, out_a2 = run(0), run(9), run(0)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_a2), atol=0)


@pytest.mark.slow
def test_factory_learned_schedule():
    from srgd_tpu.config import Config
    from srgd_tpu.factory import get_model
    conf = Config(model='conditional_continuous', noise_schedule='learned',
                  unet_dim=8, ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  learned_schedule_net_hidden_dim=16, num_sample_steps=2)
    wrapper, net, params = get_model(conf)
    assert 'log_snr' in params
    cond = jnp.zeros((1, 16, 16, 3))
    out = wrapper.sample(params, jax.random.PRNGKey(0), cond,
                         jnp.asarray([0]))
    assert out.shape == (1, 16, 16, 3)
