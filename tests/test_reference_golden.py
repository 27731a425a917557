"""Golden parity against the REFERENCE'S OWN model.py (VERDICT r2 missing #1).

Every other parity test runs against tests/torch_ref.py, a torch
re-derivation written in this repo — a shared misreading would pass all of
them. Here the golden side is /root/reference/model.py itself (3,667 lines),
imported through tests/ref_stubs/ which supplies only the tiny library
surface it inherits (SURVEY.md section 2.11: a constructor-compatible Unet
base, the standard DDPM buffer formulas, EDM preconditioning scalars, SDPA
Attend, ModelEmaV2). The reference's own samplers execute end to end:

- ConditionalContinuousTimeGaussianDiffusionSR.sample (model.py:3419) and
  tiled_sample (model.py:3288) — the flagship serving path, both grids,
  margin re-noise, remainder minibatch;
- ConditionalGaussianDiffusionSR.sample -> ddim_sample (model.py:1565-1641).

Noise is matched by reconstructing srgd-tpu's deterministic key schedule
(jax.random is pure: normal(key, shape) outside jit equals the draw inside)
and serving those exact arrays to the reference through monkeypatched
torch.randn/randn_like in call order.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from srgd_tpu.checkpoint.torch_convert import convert_unet_state_dict
from srgd_tpu.diffusion.continuous import ContinuousDiffusion
from srgd_tpu.diffusion.gaussian import GaussianDiffusion
from srgd_tpu.nn.unet import SRUnet

REF_ROOT = '/root/reference'
STUB_ROOT = 'tests/ref_stubs'

_ref = None


def ref_model():
    """Import /root/reference/model.py once, with the stub packages first on
    sys.path so its `denoising_diffusion_pytorch` / `timm` imports resolve."""
    global _ref
    if _ref is not None:
        return _ref
    import os
    stub = os.path.abspath(STUB_ROOT)
    sys.path.insert(0, stub)
    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            'ref_model', f'{REF_ROOT}/model.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules['ref_model'] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(stub)
        sys.path.remove(REF_ROOT)
    _ref = mod
    return mod


class _ReplayNoise:
    """Serve a pre-computed queue of arrays through torch.randn/randn_like."""

    def __init__(self, arrays):
        self.queue = [torch.as_tensor(a, dtype=torch.float32) for a in arrays]
        self._randn, self._randn_like = torch.randn, torch.randn_like

    def __enter__(self):
        def fake_randn(*shape, **kw):
            if len(shape) == 1 and isinstance(shape[0], (tuple, list,
                                                         torch.Size)):
                shape = tuple(shape[0])
            out = self.queue.pop(0)
            assert tuple(out.shape) == tuple(shape), (out.shape, shape)
            return out

        def fake_randn_like(x, **kw):
            out = self.queue.pop(0)
            assert out.shape == x.shape, (out.shape, x.shape)
            return out

        torch.randn, torch.randn_like = fake_randn, fake_randn_like
        return self

    def __exit__(self, *exc):
        torch.randn, torch.randn_like = self._randn, self._randn_like
        return False


def nchw(a):
    return np.ascontiguousarray(np.moveaxis(a, -1, 1))


def _assert_golden(ours, theirs, max_err_tol=1e-3, psnr_tol=60):
    ours, theirs = np.asarray(ours), np.asarray(theirs)
    assert ours.shape == theirs.shape
    max_err = np.abs(ours - theirs).max()
    mse = float(np.mean((ours - theirs) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-20))
    assert max_err < max_err_tol and psnr > psnr_tol, (max_err, psnr)


def _build_continuous_pair(dim=8, n_steps=4, num_classes=3,
                           full_attn=(False, True), attn_heads=4,
                           attn_dim_head=32, noise_schedule='linear',
                           schedule_hidden_dim=64):
    ref = ref_model()
    torch.manual_seed(0)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=full_attn,
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
        attn_heads=attn_heads, attn_dim_head=attn_dim_head,
        num_classes=num_classes)
    tnet.eval()
    tdiff = ref.ConditionalContinuousTimeGaussianDiffusionSR(
        tnet, image_size=16, noise_schedule=noise_schedule,
        num_sample_steps=n_steps,
        learned_schedule_net_hidden_dim=schedule_hidden_dim)
    tdiff.eval()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=full_attn,
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                  attn_heads=attn_heads, attn_dim_head=attn_dim_head,
                  num_classes=num_classes)
    jdiff = ContinuousDiffusion(net=jnet, image_size=16,
                                noise_schedule=noise_schedule,
                                num_sample_steps=n_steps)
    jparams = {'params': params}
    if noise_schedule == 'learned':
        from srgd_tpu.checkpoint.torch_convert import convert_learned_log_snr
        extras = {f'log_snr.{k}': v.numpy()
                  for k, v in tdiff.log_snr.state_dict().items()}
        sp = convert_learned_log_snr(extras)
        assert sp is not None
        jparams['log_snr'] = sp
    return tdiff, jdiff, jparams


@pytest.mark.parametrize('class_cond_scale', [1.0, 2.0])
def test_reference_continuous_sample_golden(class_cond_scale):
    """srgd-tpu sample() vs the reference's own p_sample_loop
    (model.py:3419 -> 3193-3246), identical injected noise."""
    n_steps = 4
    tdiff, jdiff, params = _build_continuous_pair(n_steps=n_steps)

    rng = np.random.default_rng(0)
    cond01 = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    init_noise = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    step_noises = rng.normal(size=(n_steps, 1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([1])

    ours = jdiff.sample(params, jax.random.PRNGKey(0), jnp.asarray(cond01),
                        jnp.asarray(label),
                        class_cond_scale=class_cond_scale,
                        init_noise=jnp.asarray(init_noise),
                        step_noises=jnp.asarray(step_noises))

    # reference draws: init randn(shape), then randn_like per non-final step
    queue = [nchw(init_noise)] + [nchw(step_noises[i])
                                  for i in range(n_steps - 1)]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample(
            batch_size=1, condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label),
            class_cond_scale=class_cond_scale)
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.slow
def test_reference_continuous_tiled_golden():
    """srgd-tpu tiled_sample vs the reference's own tiled_sample
    (model.py:3288-3413): both grid parities, margin re-noise, remainder
    minibatches, identical injected noise at canvas level.

    tile_size must be 256 here: the reference pads via
    ``get_coord_and_pad(h, w)`` with the DEFAULT tile_size=256 regardless of
    the tile_size argument (model.py:3301), so its geometry only matches the
    sane generalization in srgd_tpu.tiling at the one value the CLI ships.
    A 300px input pads to a 768px canvas: 3x3 aligned grid (with a
    remainder minibatch at batch_size 4) + 2x2 shifted grid + margin."""
    ref = ref_model()
    n_steps = 2
    tile, bs = 256, 4
    # linear attention only (full attention on a 128px feature map is a
    # 16k-token quadratic), and 1 head x 8 dims: the 65k-token linear-attn
    # einsums dominate the torch side's CPU time otherwise
    tdiff, jdiff, params = _build_continuous_pair(
        n_steps=n_steps, full_attn=(False, False), attn_heads=1,
        attn_dim_head=8)

    h = w = 300
    gen = np.random.default_rng(1)
    cond01 = gen.uniform(size=(1, h, w, 3)).astype(np.float32)
    label = np.asarray([2])

    # reconstruct srgd-tpu's tiled key schedule (continuous.tiled_sample):
    # rng -> (rng', init); per step i: fold_in(rng', i) -> (key_t, key_m)
    rng0 = jax.random.PRNGKey(17)
    rng1, init_key = jax.random.split(rng0)
    canvas = (1, 768, 768, 3)
    init_noise = np.asarray(jax.random.normal(init_key, canvas, jnp.float32))
    step_noise, margin_noise = {}, {}
    for i in range(n_steps):
        key_t, key_m = jax.random.split(jax.random.fold_in(rng1, i))
        step_noise[i] = np.asarray(jax.random.normal(key_t, canvas,
                                                     jnp.float32))
        margin_noise[i] = np.asarray(jax.random.normal(key_m, canvas,
                                                       jnp.float32))

    ours = jdiff.tiled_sample(params, rng0, jnp.asarray(cond01),
                              jnp.asarray(label), tile_size=tile,
                              batch_size=bs)

    # replay queue in the reference's exact draw order: init canvas randn,
    # then per step one randn_like per tile minibatch (skipped when
    # times_next == 0, i.e. the final step), then the odd-step margin
    # q_sample(zeros) canvas draw — coordinates computed by the REFERENCE'S
    # own get_coords (model.py:137-150)
    coords0 = ref.get_coords(768, 768, tile, tile, diff=0)
    coords1 = ref.get_coords(768 - tile, 768 - tile, tile, tile,
                             diff=tile // 2)
    queue = [nchw(init_noise)]
    for i in range(n_steps):
        coords = coords0 if i % 2 == 0 else coords1
        if i != n_steps - 1:             # times_next == 0 -> no draw
            for j in range(0, len(coords), bs):
                chunk = coords[j:j + bs]
                arr = np.stack([step_noise[i][0, hs:he, ws:we, :]
                                for (hs, he, ws, we) in chunk])
                queue.append(nchw(arr))
        if i % 2 == 1:
            queue.append(nchw(margin_noise[i]))

    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.tiled_sample(
            batch_size=bs, tile_size=tile, tile_stride=tile,
            condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label))
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.slow
def test_reference_continuous_tiled_overlap_stride_golden():
    """Overlapping odd grid (tile_stride < tile_size) vs the reference's own
    tiled_sample (model.py:3288-3413 at tile_stride=128): 3x3 overlapping
    shifted tiles, row-major last-write-wins.

    batch_size=9 >= n_tiles so the reference runs exactly one minibatch per
    grid: this is the configuration srgd-tpu's chunk-invariant semantics
    matches bit-for-bit (the reference's sub-batch writeback makes overlap
    output depend on batch_size — documented divergence, docs/PARITY.md #3)."""
    ref = ref_model()
    n_steps = 2
    tile, stride, bs = 256, 128, 9
    tdiff, jdiff, params = _build_continuous_pair(
        n_steps=n_steps, full_attn=(False, False), attn_heads=1,
        attn_dim_head=8)

    h = w = 300                       # 768px canvas, 3x3 even grid
    gen = np.random.default_rng(3)
    cond01 = gen.uniform(size=(1, h, w, 3)).astype(np.float32)
    label = np.asarray([1])

    rng0 = jax.random.PRNGKey(23)
    rng1, init_key = jax.random.split(rng0)
    canvas = (1, 768, 768, 3)
    init_noise = np.asarray(jax.random.normal(init_key, canvas, jnp.float32))
    step_noise, margin_noise = {}, {}
    for i in range(n_steps):
        key_t, key_m = jax.random.split(jax.random.fold_in(rng1, i))
        step_noise[i] = np.asarray(jax.random.normal(key_t, canvas,
                                                     jnp.float32))
        margin_noise[i] = np.asarray(jax.random.normal(key_m, canvas,
                                                       jnp.float32))

    ours = jdiff.tiled_sample(params, rng0, jnp.asarray(cond01),
                              jnp.asarray(label), tile_size=tile,
                              tile_stride=stride, batch_size=bs)

    coords0 = ref.get_coords(768, 768, tile, tile, diff=0)
    coords1 = ref.get_coords(768 - tile, 768 - tile, tile, stride,
                             diff=tile // 2)
    assert len(coords1) == 9          # 3x3 overlapping interior grid
    queue = [nchw(init_noise)]
    for i in range(n_steps):
        coords = coords0 if i % 2 == 0 else coords1
        if i != n_steps - 1:
            for j in range(0, len(coords), bs):
                chunk = coords[j:j + bs]
                arr = np.stack([step_noise[i][0, hs:he, ws:we, :]
                                for (hs, he, ws, we) in chunk])
                queue.append(nchw(arr))
        if i % 2 == 1:
            queue.append(nchw(margin_noise[i]))

    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.tiled_sample(
            batch_size=bs, tile_size=tile, tile_stride=stride,
            condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label))
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.parametrize('class_cond_scale', [1.0, 2.0])
def test_reference_elucidated_heun_golden(class_cond_scale):
    """srgd-tpu sample_org vs the reference's own stochastic Heun sampler
    (ConditionalElucidatedDiffusionSR.sample_org, model.py:2212-2306),
    identical injected noise. The sampler loop, churn schedule, CFG merge
    and 2nd-order correction are all reference-authored; the stub only
    supplies the EDM preconditioning scalars (SURVEY 2.11). n=4 Karras
    sigmas exercise both gamma branches (sigma_0=80 > S_tmax and
    sigma_3=0.002 < S_tmin get gamma 0; the middle two churn)."""
    from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion

    ref = ref_model()
    dim, n_steps = 8, 4
    torch.manual_seed(2)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, True),
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
        num_classes=3)
    tnet.eval()
    tdiff = ref.ConditionalElucidatedDiffusionSR(
        tnet, image_size=16, num_sample_steps=n_steps)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, True),
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                  num_classes=3)
    jdiff = ElucidatedDiffusion(net=jnet, image_size=16,
                                num_sample_steps=n_steps)

    gen = np.random.default_rng(5)
    cond01 = gen.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([2])

    # srgd sample_org key schedule: rng -> (rng', init); eps_i from
    # fold_in(rng', i) for every step incl. the final Euler one (where
    # gamma=0 makes it a dead draw — the reference draws it too)
    rng0 = jax.random.PRNGKey(29)
    rng1, init_key = jax.random.split(rng0)
    shape = (1, 16, 16, 3)
    init_raw = np.asarray(jax.random.normal(init_key, shape, jnp.float32))
    eps = [np.asarray(jax.random.normal(jax.random.fold_in(rng1, i), shape,
                                        jnp.float32))
           for i in range(n_steps)]

    ours = jdiff.sample_org(params={'params': params}, rng=rng0,
                            condition_x=jnp.asarray(cond01),
                            class_label=jnp.asarray(label),
                            class_cond_scale=class_cond_scale)

    # reference draws: init_sigma * randn(shape), then one randn(shape)
    # eps per sigmas_and_gammas entry (model.py:2244, 2270)
    queue = [nchw(init_raw)] + [nchw(e) for e in eps]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample_org(
            batch_size=1, condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label),
            class_cond_scale=class_cond_scale)
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.slow
def test_reference_elucidated_tiled_golden():
    """srgd-tpu EDM tiled_sample vs the reference's own tiled Heun sampler
    (model.py:2308-2475): canvas-level churn noise before tiling, per-tile
    2nd-order correction, remainder minibatch, odd-step margin re-noise via
    get_noised_images(zeros, i) at the CURRENT step's sigma — all
    reference-authored quirks. 300px cond -> 768px canvas: 3x3 even grid
    (remainder minibatch at batch 4) + 2x2 shifted grid + margin.

    n_steps must be >= 3 (round 4, the red-golden accounting): the Heun
    correction amplifies any fp discrepancy in the SECOND network eval by
    0.5*(sigma_hat-sigma_next)/sigma_next. At n=2 the Karras schedule is
    [80, 0.002, 0], so that factor is ~2e4 and plain jax-vs-torch f32 conv
    noise (~1e-7 relative) lands at ~1e-2 absolute: the identical
    SINGLE-TILE sampler (no tiling code at all) measures max_err 2.87e-2
    at n=2 vs 4.7e-5 at n=3 vs 6.7e-6 at n=4, tracking the analytic factor
    (tools/debug_edm_n2.py). n=3 ([80, 2.515, 0.002, 0], worst factor 628)
    keeps the 1e-3 gate meaningful and covers MORE of the reference path
    than n=2 did: sigma_1=2.515 is inside [S_tmin, S_tmax] so canvas-level
    churn (model.py:2392-2395) actually fires, and the shifted/margin grid
    gets a true 2nd-order step (at n=2 the odd step was the Euler-only
    final step, leaving both branches dead)."""
    from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion

    ref = ref_model()
    dim, n_steps, tile, bs = 8, 3, 256, 4
    torch.manual_seed(6)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, False),
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
        attn_heads=1, attn_dim_head=8, num_classes=3)
    tnet.eval()
    tdiff = ref.ConditionalElucidatedDiffusionSR(
        tnet, image_size=tile, num_sample_steps=n_steps)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, False),
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                  attn_heads=1, attn_dim_head=8, num_classes=3)
    jdiff = ElucidatedDiffusion(net=jnet, image_size=tile,
                                num_sample_steps=n_steps)

    h = w = 300
    gen = np.random.default_rng(11)
    cond01 = gen.uniform(size=(1, h, w, 3)).astype(np.float32)
    label = np.asarray([1])

    # srgd key schedule (elucidated.tiled_sample): rng -> (rng', init);
    # per step i: fold_in(rng', i) -> (key_t eps, key_m margin)
    rng0 = jax.random.PRNGKey(37)
    rng1, init_key = jax.random.split(rng0)
    canvas = (1, 768, 768, 3)
    init_raw = np.asarray(jax.random.normal(init_key, canvas, jnp.float32))
    eps_raw, margin_raw = {}, {}
    for i in range(n_steps):
        key_t, key_m = jax.random.split(jax.random.fold_in(rng1, i))
        eps_raw[i] = np.asarray(jax.random.normal(key_t, canvas, jnp.float32))
        margin_raw[i] = np.asarray(jax.random.normal(key_m, canvas,
                                                     jnp.float32))

    ours = jdiff.tiled_sample({'params': params}, rng0, jnp.asarray(cond01),
                              jnp.asarray(label), tile_size=tile,
                              batch_size=bs)

    # reference draws, in order: init canvas randn (scaled by sigma_0
    # inside), then per step one canvas randn for eps (model.py:2392 —
    # drawn even when gamma=0 leaves it unused), then on odd steps the
    # margin randn_like(zeros) inside get_noised_images (model.py:2457)
    queue = [nchw(init_raw)]
    for i in range(n_steps):
        queue.append(nchw(eps_raw[i]))
        if i % 2 == 1:
            queue.append(nchw(margin_raw[i]))
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.tiled_sample(
            batch_size=bs, tile_size=tile, tile_stride=tile,
            condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label))
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


def test_reference_elucidated_dpmpp_golden():
    """srgd-tpu sample_using_dpmpp vs the reference's own DPM-Solver++(2M)
    (model.py:2478-2557; deterministic given the init draw — the multistep
    denoised_d extrapolation, log-sigma step math and terminal sigma=0
    step are all reference-authored)."""
    from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion

    ref = ref_model()
    dim, n_steps = 8, 5
    torch.manual_seed(4)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, True),
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
        num_classes=3)
    tnet.eval()
    tdiff = ref.ConditionalElucidatedDiffusionSR(
        tnet, image_size=16, num_sample_steps=n_steps, use_dpmpp_solver=True)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, True),
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                  num_classes=3)
    jdiff = ElucidatedDiffusion(net=jnet, image_size=16,
                                num_sample_steps=n_steps,
                                use_dpmpp_solver=True)

    gen = np.random.default_rng(7)
    cond01 = gen.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([0])

    rng0 = jax.random.PRNGKey(31)
    _, init_key = jax.random.split(rng0)
    init_raw = np.asarray(jax.random.normal(init_key, (1, 16, 16, 3),
                                            jnp.float32))

    # dispatch through sample() so the use_dpmpp_solver routing
    # (model.py:2196-2209) is covered too
    ours = jdiff.sample({'params': params}, rng0, jnp.asarray(cond01),
                        jnp.asarray(label))

    with torch.no_grad(), _ReplayNoise([nchw(init_raw)]) as replay:
        theirs = tdiff.sample(batch_size=1,
                              condition_x=torch.as_tensor(nchw(cond01)),
                              class_label=torch.as_tensor(label))
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


def test_reference_learned_schedule_golden():
    """srgd-tpu 'learned' noise schedule vs the reference's own
    learned_noise_schedule (model.py:2638-2676: MonotonicLinear |W|/|b|
    stack, endpoint normalization, frac_gradient) executing inside the
    reference's own p_sample_loop (model.py:3191-3246) — until round 4 the
    learned schedule was pinned only against tests/torch_ref re-derivations
    (VERDICT r3 missing #2). Random-init schedule weights: torch.manual_seed
    inits MonotonicLinear like nn.Linear, so |W| is a nontrivial monotone
    net, converted via convert_learned_log_snr."""
    n_steps = 4
    tdiff, jdiff, params = _build_continuous_pair(
        n_steps=n_steps, noise_schedule='learned')

    rng = np.random.default_rng(9)
    cond01 = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    init_noise = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    step_noises = rng.normal(size=(n_steps, 1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([0])

    ours = jdiff.sample(params, jax.random.PRNGKey(0), jnp.asarray(cond01),
                        jnp.asarray(label),
                        init_noise=jnp.asarray(init_noise),
                        step_noises=jnp.asarray(step_noises))

    queue = [nchw(init_noise)] + [nchw(step_noises[i])
                                  for i in range(n_steps - 1)]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample(
            batch_size=1, condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label))
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.parametrize('class_cond_scale', [1.0, 2.0])
def test_reference_gaussian_ancestral_golden(class_cond_scale):
    """srgd-tpu ancestral p_sample_loop vs the reference's own
    (ConditionalGaussianDiffusionSR.p_sample_loop, model.py:1517-1563 via
    the sample() dispatch at 1645-1659: sampling_timesteps == timesteps ->
    not is_ddim_sampling): posterior mean/log-variance update, clip_denoised,
    no noise at t == 0, class-CFG lerp — all reference-authored."""
    ref = ref_model()
    dim, T = 8, 8
    torch.manual_seed(3)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, True),
        learned_sinusoidal_cond=False, num_classes=3)
    tnet.eval()
    tdiff = ref.ConditionalGaussianDiffusionSR(
        model=tnet, image_size=16, timesteps=T, sampling_timesteps=T,
        objective='pred_v', beta_schedule='sigmoid')
    assert not tdiff.is_ddim_sampling

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, True),
                  learned_sinusoidal_cond=False, num_classes=3)
    jdiff = GaussianDiffusion(net=jnet, image_size=16, timesteps=T,
                              sampling_timesteps=T, objective='pred_v',
                              beta_schedule='sigmoid')
    assert not jdiff.is_ddim_sampling

    gen = np.random.default_rng(4)
    cond01 = gen.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([1])

    # srgd p_sample_loop key schedule: rng -> (rng', init); step noise i
    # from fold_in(rng', i), i = 0..T-1 walking t = T-1-i
    rng0 = jax.random.PRNGKey(41)
    rng1, init_key = jax.random.split(rng0)
    shape = (1, 16, 16, 3)
    init_noise = np.asarray(jax.random.normal(init_key, shape, jnp.float32))
    step_noise = [np.asarray(jax.random.normal(jax.random.fold_in(rng1, i),
                                               shape, jnp.float32))
                  for i in range(T)]

    ours = jdiff.sample({'params': params}, rng0, jnp.asarray(cond01),
                        jnp.asarray(label),
                        class_cond_scale=class_cond_scale)

    # reference: init randn(shape), then randn_like per step EXCEPT t == 0
    # ("noise = torch.randn_like(x) if t > 0 else 0.", model.py:1513)
    queue = [nchw(init_noise)] + [nchw(step_noise[i]) for i in range(T - 1)]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample(batch_size=1,
                              condition_x=torch.as_tensor(nchw(cond01)),
                              class_label=torch.as_tensor(label),
                              class_cond_scale=class_cond_scale)
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.slow
def test_reference_gaussian_tiled_golden():
    """srgd-tpu discrete tiled DDIM vs the reference's own
    GaussianDiffusionSR.tiled_sample (model.py:1080-1227) — the
    UNCONDITIONAL class (constructed directly; the get_model factory path
    for it is broken, SURVEY 2.13.1), at cond_scale 2.0 so the null-cond
    CFG branch AND the clip_x_start + rederive_pred_noise dance
    (model.py:917-947) execute under guidance. Covers: per-tile
    model_predictions scattered to pred_noise/x_start canvases, the
    canvas-level DDIM update with one canvas noise draw per step, terminal
    time_next < 0 -> img = x_start (continue BEFORE margin re-noise), and
    odd-step margin q_sample(zeros, t_next). 300px cond -> 768px canvas,
    sampling_timesteps=3: even(9 tiles, remainder minibatch at bs 4) ->
    odd(4 tiles)+margin -> even terminal."""
    ref = ref_model()
    dim, T, S, tile, bs = 8, 20, 3, 256, 4
    torch.manual_seed(7)
    tnet = ref.SRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, False),
        learned_sinusoidal_cond=False, attn_heads=1, attn_dim_head=8)
    tnet.eval()
    tdiff = ref.GaussianDiffusionSR(
        model=tnet, image_size=tile, timesteps=T, sampling_timesteps=S,
        objective='pred_v', beta_schedule='sigmoid')

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, False),
                  learned_sinusoidal_cond=False, attn_heads=1,
                  attn_dim_head=8, num_classes=None)
    jdiff = GaussianDiffusion(net=jnet, image_size=tile, timesteps=T,
                              sampling_timesteps=S, objective='pred_v',
                              beta_schedule='sigmoid')

    h = w = 300
    gen = np.random.default_rng(13)
    cond01 = gen.uniform(size=(1, h, w, 3)).astype(np.float32)

    # srgd tiled key schedule (gaussian.tiled_sample): rng -> (rng', init);
    # per step i: fold_in(rng', i) -> (key_t canvas noise, key_m margin)
    rng0 = jax.random.PRNGKey(43)
    rng1, init_key = jax.random.split(rng0)
    canvas = (1, 768, 768, 3)
    init_noise = np.asarray(jax.random.normal(init_key, canvas, jnp.float32))
    step_noise, margin_noise = {}, {}
    for i in range(S):
        key_t, key_m = jax.random.split(jax.random.fold_in(rng1, i))
        step_noise[i] = np.asarray(jax.random.normal(key_t, canvas,
                                                     jnp.float32))
        margin_noise[i] = np.asarray(jax.random.normal(key_m, canvas,
                                                       jnp.float32))

    ours = jdiff.tiled_sample({'params': params}, rng0, jnp.asarray(cond01),
                              None, tile_size=tile, batch_size=bs,
                              cond_scale=2.0)

    # reference draws: init canvas randn, then per step ONE canvas
    # randn_like AFTER the tile loop (model.py:1193 — drawn on the terminal
    # step too, before the continue), plus the odd-step margin
    # q_sample(zeros, t_next) randn_like (model.py:1205-1209, skipped on
    # terminal steps because the time_next < 0 branch continues first)
    times = np.linspace(-1, T - 1, S + 1).astype(np.int64).tolist()
    times = list(reversed(times))
    time_pairs = list(zip(times[:-1], times[1:]))
    queue = [nchw(init_noise)]
    for i, (_, t_next) in enumerate(time_pairs):
        queue.append(nchw(step_noise[i]))
        if t_next >= 0 and i % 2 == 1:
            queue.append(nchw(margin_noise[i]))
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.tiled_sample(
            batch_size=bs, tile_size=tile, tile_stride=tile,
            condition_x=torch.as_tensor(nchw(cond01)), cond_scale=2.0)
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


@pytest.mark.parametrize('class_cond_scale', [2.0])
def test_reference_gaussian_ddim_cfg_golden(class_cond_scale):
    """The conditional clip_x_start + rederive_pred_noise dance UNDER
    class-CFG (model.py:1475-1487 with the class_cond_scale lerp at
    1463-1466) through the reference's own ddim_sample — the eta=0 DDIM
    golden below runs it unguided only."""
    _run_gaussian_ddim_golden(class_cond_scale=class_cond_scale)


def test_reference_gaussian_ddim_golden():
    """srgd-tpu DDIM vs the reference's own ddim_sample (model.py:1565-1641;
    eta=0 deterministic — only the init noise enters the output)."""
    _run_gaussian_ddim_golden(class_cond_scale=1.0)


def _run_gaussian_ddim_golden(class_cond_scale):
    ref = ref_model()
    dim, T, S = 8, 20, 10
    torch.manual_seed(1)
    tnet = ref.ConditionalSRUnet(
        dim=dim, dim_mults=(1, 2), full_attn=(False, True),
        learned_sinusoidal_cond=False, num_classes=3)
    tnet.eval()
    tdiff = ref.ConditionalGaussianDiffusionSR(
        model=tnet, image_size=16, timesteps=T, sampling_timesteps=S,
        objective='pred_v', beta_schedule='sigmoid')

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, unmatched = convert_unet_state_dict(sd, num_stages=2)
    assert not unmatched
    jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, True),
                  learned_sinusoidal_cond=False, num_classes=3)
    jdiff = GaussianDiffusion(net=jnet, image_size=16, timesteps=T,
                              sampling_timesteps=S, objective='pred_v',
                              beta_schedule='sigmoid')

    gen = np.random.default_rng(2)
    cond01 = gen.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    label = np.asarray([0])

    # srgd ddim_sample key schedule: rng -> (rng', init)
    rng0 = jax.random.PRNGKey(23)
    _, init_key = jax.random.split(rng0)
    init_noise = np.asarray(jax.random.normal(init_key, (1, 16, 16, 3),
                                              jnp.float32))

    ours = jdiff.sample({'params': params}, rng0, jnp.asarray(cond01),
                        jnp.asarray(label),
                        class_cond_scale=class_cond_scale)

    # reference: init randn(shape), then one (unused, eta=0) randn_like per
    # non-final time pair (S pairs, last has time_next < 0)
    queue = [nchw(init_noise)] + [np.zeros((1, 3, 16, 16), np.float32)
                                  for _ in range(S - 1)]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample(batch_size=1,
                              condition_x=torch.as_tensor(nchw(cond01)),
                              class_label=torch.as_tensor(label),
                              class_cond_scale=class_cond_scale)
        assert not replay.queue
    _assert_golden(ours, np.moveaxis(theirs.numpy(), 1, -1))


def test_reference_get_model_consumes_reverse_export(tmp_path):
    """The REFERENCE'S OWN factory consumes our exported .pth (VERDICT r4
    missing #3): get_model (model.py:3500-3666) builds its
    ConditionalSRUnet + shipped wrapper, then torch.load ->
    ema.module.load_state_dict(ckpt['ema_model'], strict=True)
    (model.py:3659-3664) on a checkpoint produced by
    flax_to_torch_unet_state_dict from random flax init. strict=True means
    any missing/unexpected key raises — a clean load IS the zero-mismatch
    assertion. Forward parity of the loaded reference net vs the flax net
    on the same inputs then proves every tensor landed in the right slot,
    closing the flax->torch migration loop end-to-end through the
    reference's own loader."""
    import logging

    from srgd_tpu.checkpoint.torch_convert import (
        flax_to_torch_unet_state_dict)
    from srgd_tpu.config import Config

    dim, mults, fattn = 8, (1, 2), (False, True)
    net = SRUnet(dim=dim, dim_mults=mults, full_attn=fattn,
                 learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                 num_classes=3)
    variables = net.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
                         cond=jnp.zeros((1, 16, 16, 3)),
                         class_label=jnp.zeros((1,), jnp.int32))
    sd = flax_to_torch_unet_state_dict(variables['params'])
    pth = str(tmp_path / 'exported.pth')
    torch.save({'ema_model': {f'model.{k}': torch.as_tensor(np.asarray(v))
                              for k, v in sd.items()}}, pth)

    conf = Config(model='conditional_continuous', unet_dim=dim,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  num_classes=3, noise_schedule='linear', image_size=16,
                  ckpt_path=pth, load_strict=True)
    ema = ref_model().get_model(conf, logging.getLogger('ref'))

    gen = np.random.default_rng(9)
    x = gen.standard_normal((2, 16, 16, 3)).astype(np.float32)
    cond = gen.standard_normal((2, 16, 16, 3)).astype(np.float32)
    time = np.asarray([0.3, -1.2], np.float32)
    label = np.asarray([0, 2])

    ours = net.apply({'params': variables['params']}, jnp.asarray(x),
                     jnp.asarray(time), cond=jnp.asarray(cond),
                     class_label=jnp.asarray(label))
    with torch.no_grad():
        theirs = ema.module.model(
            torch.from_numpy(np.moveaxis(x, -1, 1)),
            torch.from_numpy(time),
            torch.from_numpy(label),
            x_self_cond=torch.from_numpy(np.moveaxis(cond, -1, 1)))
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.moveaxis(theirs.numpy(), 1, -1),
                               atol=2e-4, rtol=1e-3)
