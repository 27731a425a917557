"""Tiled-sampler debug-capture tests (the reference's with_images /
with_x0_images, /root/reference/model.py:3320-3325, 3398-3401).

Contract (all three families): frames are [-1,1] canvases cropped to the
output region; frame 0 is the cropped init canvas; one frame per executed
step (so len = 1 + num_steps - generation_start_steps); the last image frame
unnormalizes to the returned output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srgd_tpu.diffusion.continuous import ContinuousDiffusion
from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion
from srgd_tpu.diffusion.gaussian import GaussianDiffusion
from tests.test_continuous import FakeNet

N_STEPS = 4


def make(family):
    if family == 'continuous':
        return ContinuousDiffusion(net=FakeNet(), image_size=16,
                                   num_sample_steps=N_STEPS)
    if family == 'gaussian':
        return GaussianDiffusion(net=FakeNet(), image_size=16,
                                 beta_schedule='cosine', timesteps=20,
                                 sampling_timesteps=N_STEPS)
    return ElucidatedDiffusion(net=FakeNet(), image_size=16,
                               num_sample_steps=N_STEPS)


# 40px canvas -> padded to 3x3 tiles of 16 with a margin, exercising both
# grids and the margin re-noise path.
COND = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 40, 3))


@pytest.mark.parametrize('family', ['continuous', 'gaussian', 'elucidated'])
@pytest.mark.parametrize('host_loop', [False, True])
def test_tiled_capture_frames(family, host_loop):
    d = make(family)
    rng = jax.random.PRNGKey(7)
    kw = dict(batch_size=4, tile_size=16, host_loop=host_loop)

    out = d.tiled_sample({}, rng, COND, **kw)
    out2, traj, x0_traj = d.tiled_sample({}, rng, COND, capture_trajectory=True,
                                         capture_x0=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

    assert traj.shape == (N_STEPS + 1,) + out.shape
    assert x0_traj.shape == traj.shape
    # frame 0 of both stacks is the cropped init canvas (model.py:3320-3325)
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0_traj[0]),
                               atol=0)
    # the last image frame is the raw [-1,1] canvas behind the output
    np.testing.assert_allclose(
        np.asarray((jnp.clip(traj[-1], -1, 1) + 1) * 0.5),
        np.asarray(out), atol=1e-6)
    # per-step x0 frames differ from the image frames (they hold the model's
    # denoised estimate / derivative, not the noisy canvas)
    assert not np.allclose(np.asarray(traj[1]), np.asarray(x0_traj[1]))
    assert np.isfinite(np.asarray(x0_traj)).all()


@pytest.mark.parametrize('family', ['continuous', 'gaussian', 'elucidated'])
def test_tiled_capture_each_flag_alone(family):
    d = make(family)
    rng = jax.random.PRNGKey(7)
    kw = dict(batch_size=4, tile_size=16, host_loop=False)
    out_t, traj = d.tiled_sample({}, rng, COND, capture_trajectory=True, **kw)
    out_x, x0_traj = d.tiled_sample({}, rng, COND, capture_x0=True, **kw)
    both = d.tiled_sample({}, rng, COND, capture_trajectory=True,
                          capture_x0=True, **kw)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(both[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_traj), np.asarray(both[2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_x), atol=1e-6)


@pytest.mark.parametrize('family', ['continuous', 'gaussian', 'elucidated'])
def test_nontiled_capture_frames(family):
    """Non-tiled samplers: init frame + one per step, both stacks
    (model.py:985-987, 1032-1034, 2245-2250, 3205-3211)."""
    d = make(family)
    rng = jax.random.PRNGKey(5)
    cond = jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 16, 3))
    out, traj, x0 = d.sample({}, rng, cond, capture_trajectory=True,
                             capture_x0=True)
    assert traj.shape == (N_STEPS + 1,) + (1, 16, 16, 3)
    assert x0.shape == traj.shape
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0[0]), atol=0)
    assert not np.allclose(np.asarray(traj[1]), np.asarray(x0[1]))
    out_plain = d.sample({}, rng, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain),
                               atol=1e-6)
    if family == 'elucidated':  # the Heun path captures too (model.py:2245)
        o3, t3, x3 = d.sample_org({}, rng, cond, capture_trajectory=True,
                                  capture_x0=True)
        assert t3.shape == (N_STEPS + 1, 1, 16, 16, 3)
        assert x3.shape == t3.shape


def test_capture_respects_generation_start_steps():
    d = make('continuous')
    rng = jax.random.PRNGKey(3)
    out, traj, x0 = d.tiled_sample({}, rng, COND, batch_size=4, tile_size=16,
                                   generation_start_steps=2,
                                   capture_trajectory=True, capture_x0=True)
    # frames: init + one per executed step (the reference `continue`s before
    # appending for skipped steps, model.py:3347-3348)
    assert traj.shape[0] == 1 + (N_STEPS - 2)
    assert x0.shape[0] == traj.shape[0]
