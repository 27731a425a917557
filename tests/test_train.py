"""Training subsystem tests: degradation data pipeline, optimizer/EMA,
end-to-end loop with checkpoint save/resume, metrics."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, size=(96, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    return d


def test_degrade_classes(image_dir):
    from srgd_tpu.train.data import CLASS_DENOISE, CLASS_REALSR, CLASS_SR, degrade
    rng = np.random.default_rng(1)
    hr = np.asarray(Image.open(image_dir / 'im0.png'))[:64, :64]
    for label in (CLASS_REALSR, CLASS_DENOISE, CLASS_SR):
        out = degrade(hr, label, rng)
        assert out.shape == hr.shape and out.dtype == np.uint8
    # sr-class degradation is deterministic bicubic down-up
    a = degrade(hr, CLASS_SR, np.random.default_rng(2))
    b = degrade(hr, CLASS_SR, np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)


def test_degrade_config_surface(image_dir):
    """Every reference degradation knob (config.py:146-170) is honored or
    rejected — no silently-ignored accepted config."""
    from srgd_tpu.train.data import (
        DegradeConfig, aniso_gaussian_kernel, degrade, iso_noise,
        multiplicative_noise, sinc_kernel, usm_sharpen)

    rng = np.random.default_rng(0)
    hr = np.asarray(Image.open(image_dir / 'im0.png'))[:64, :64]

    # each trans_mode produces a valid condition image for the realsr class
    for mode in ('simple', 'aug_v1', 'aug_v2', 'realesrgan'):
        cfg = DegradeConfig(trans_mode=mode)
        out = degrade(hr, 0, np.random.default_rng(1), cfg=cfg)
        assert out.shape == hr.shape and out.dtype == np.uint8, mode

    # unknown values raise instead of being ignored
    with pytest.raises(ValueError):
        DegradeConfig(trans_mode='mystery')
    with pytest.raises(ValueError):
        DegradeConfig(interpolation='NEAREST')

    # kernels are normalized and shaped
    k = sinc_kernel(np.pi / 3, size=21)
    assert k.shape == (21, 21) and abs(float(k.sum()) - 1.0) < 1e-5
    k = aniso_gaussian_kernel(1.0, 3.0, 0.7, size=21)
    assert abs(float(k.sum()) - 1.0) < 1e-5
    # anisotropy: rotated kernel differs from its transpose
    assert not np.allclose(k, k.T)

    # noise ops change the image but stay uint8 in-range
    for op in (lambda im: iso_noise(im, rng),
               lambda im: multiplicative_noise(im, rng)):
        out = op(hr)
        assert out.dtype == np.uint8 and out.shape == hr.shape
        assert not np.array_equal(out, hr)

    # usm sharpening keeps dtype/shape and increases local contrast
    sharp = usm_sharpen(hr)
    assert sharp.dtype == np.uint8 and sharp.shape == hr.shape
    assert float(np.std(sharp.astype(np.float32))) >= \
        float(np.std(hr.astype(np.float32))) - 1e-3

    # per-kind probs select deterministically when only one kind is enabled
    cfg = DegradeConfig(blur_prob=1.0, gaussian_blur_prob=0.0,
                        advance_blur_prob=0.0, sinc_blur_prob=1.0,
                        noise_prob=0.0, image_compression_prob=0.0)
    out = degrade(hr, 0, np.random.default_rng(2), cfg=cfg)
    assert out.shape == hr.shape


def test_dataset_batches(image_dir):
    from srgd_tpu.train.data import DegradationDataset
    ds = DegradationDataset(str(image_dir), crop_size=32, batch_size=4,
                            num_workers=1, seed=0)
    it = iter(ds)
    hr, cond, label = next(it)
    assert hr.shape == (4, 32, 32, 3) and cond.shape == (4, 32, 32, 3)
    assert hr.dtype == np.float32 and hr.min() >= 0 and hr.max() <= 1
    assert label.shape == (4,) and set(label) <= {0, 1, 2}


def test_dataset_uint8_batches(image_dir):
    """as_uint8 ships [0,255] uint8 (4x fewer relay transfer bytes); the
    train step normalizes on-device and must match the f32 pipeline."""
    from srgd_tpu.train.data import DegradationDataset
    ds8 = DegradationDataset(str(image_dir), crop_size=32, batch_size=2,
                             num_workers=1, seed=0, as_uint8=True)
    hr, cond, label = next(iter(ds8))
    assert hr.dtype == np.uint8 and cond.dtype == np.uint8
    dsf = DegradationDataset(str(image_dir), crop_size=32, batch_size=2,
                             num_workers=1, seed=0)
    hrf, condf, labelf = next(iter(dsf))
    np.testing.assert_allclose(hr.astype(np.float32) / 255.0, hrf)
    np.testing.assert_allclose(cond.astype(np.float32) / 255.0, condf)
    np.testing.assert_array_equal(label, labelf)


def test_fft_conv2d_matches_direct():
    """The FFT degradation convolution must match scipy.ndimage's direct
    reflect-padded convolution (the previous implementation) to uint8."""
    from scipy.ndimage import convolve
    from srgd_tpu.train.data import _conv2d, aniso_gaussian_kernel, sinc_kernel
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    for k in (sinc_kernel(1.2, 21), aniso_gaussian_kernel(1.5, 0.4, 0.7, 21)):
        got = _conv2d(img, k).astype(np.int32)
        want = np.empty_like(img, dtype=np.float32)
        for ch in range(3):
            want[:, :, ch] = convolve(img[:, :, ch].astype(np.float32), k,
                                      mode='reflect')
        want = np.clip(want, 0, 255).astype(np.uint8).astype(np.int32)
        # float rounding at the uint8 cast can differ by 1 LSB on ties
        assert np.abs(got - want).max() <= 1


def test_dataset_missing_dir(tmp_path):
    from srgd_tpu.train.data import DegradationDataset
    with pytest.raises(FileNotFoundError):
        DegradationDataset(str(tmp_path / 'nope'))


def test_fold_split_and_validation_ratio():
    """n_fold/train_fold/validation_ratio (reference config.py:65-66, 71):
    deterministic held-out-fold split; train/val partition the files."""
    from srgd_tpu.train.data import fold_split
    files = [f'{i}.png' for i in range(10)]
    tr = fold_split(files, 5, '0', 'train')
    va = fold_split(files, 5, '0', 'val')
    assert not set(tr) & set(va)
    assert sorted(tr + va) == files
    assert va == ['0.png', '5.png']
    assert fold_split(files, 5, '0', 'val', validation_ratio=0.5) == ['0.png']
    assert len(fold_split(files, 5, '0,1', 'val')) == 4
    assert fold_split(files, 1, '0', 'train') == files   # n_fold<=1 = off
    assert fold_split(files, 5, '0', None) == files
    with pytest.raises(ValueError, match='out of range'):
        fold_split(files, 5, '7', 'val')


def test_dataset_honors_size_and_fold_knobs(image_dir):
    """crop_size_limit / crop_rate / scale / fold knobs are live on the
    dataset (previously accepted-but-inert config surface)."""
    from srgd_tpu.train.data import DegradationDataset
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        image_dir / 'aa_small.png')

    # crop_size_limit drops images whose short side < crop_size
    ds = DegradationDataset(str(image_dir), crop_size=64, batch_size=2,
                            num_workers=1, crop_size_limit=True)
    assert len(ds.files) == 3 and not any('aa_small' in f for f in ds.files)
    ds_all = DegradationDataset(str(image_dir), crop_size=64, batch_size=2,
                                num_workers=1)
    assert len(ds_all.files) == 4
    with pytest.raises(FileNotFoundError, match='crop_size_limit'):
        DegradationDataset(str(image_dir), crop_size=512,
                           crop_size_limit=True)

    # fold split partitions the file list
    dt = DegradationDataset(str(image_dir), crop_size=32, num_workers=1,
                            n_fold=2, fold='0', fold_role='train')
    dv = DegradationDataset(str(image_dir), crop_size=32, num_workers=1,
                            n_fold=2, fold='0', fold_role='val')
    assert sorted(dt.files + dv.files) == sorted(ds_all.files)
    assert not set(dt.files) & set(dv.files)

    # crop_rate=2 crops a 2x region and resizes down — same output shape
    ds3 = DegradationDataset(str(image_dir), crop_size=32, batch_size=2,
                             num_workers=1, crop_rate=2, seed=3,
                             crop_size_limit=True)
    hr, cond, label = next(iter(ds3))
    assert hr.shape == (2, 32, 32, 3) and cond.shape == (2, 32, 32, 3)

    # scale=2 (hr/lr image size ratio) drives the degradation downsampling
    ds4 = DegradationDataset(str(image_dir), crop_size=32, batch_size=2,
                             num_workers=1, scale=2, seed=4,
                             crop_size_limit=True)
    hr, cond, label = next(iter(ds4))
    assert cond.shape == (2, 32, 32, 3)


def test_train_rejects_bad_task_valsets_and_sizes(tmp_path):
    """conditional_task_type is validated; external val-set knobs are named
    errors; inconsistent hr/lr image sizes are rejected."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train
    base = dict(model='conditional_continuous', unet_dim=8,
                ddpm_unet_dim_mults='1,2', full_attn='False,True',
                learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                hr_image_size=16, lr_image_size=4, batch_size=2)
    with pytest.raises(ValueError, match='conditional_task_type'):
        train(Config(**{**base, 'conditional_task_type': 'faces'}),
              'unused', str(tmp_path / 'a'))
    with pytest.raises(NotImplementedError, match='val_realsrv3'):
        train(Config(val_realsrv3=True, **base), 'unused', str(tmp_path / 'b'))
    with pytest.raises(NotImplementedError, match='val_realsrv3'):
        train(Config(val_drealsr=True, **base), 'unused', str(tmp_path / 'c'))
    with pytest.raises(ValueError, match='integer multiple'):
        train(Config(**{**base, 'lr_image_size': 7}),
              'unused', str(tmp_path / 'd'))


def test_ema_update():
    from srgd_tpu.train.ema import ema_update
    ema = {'w': jnp.ones((3,))}
    new = {'w': jnp.zeros((3,))}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(out['w']), 0.9)


def test_lr_schedule():
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_lr_schedule
    conf = Config(lr=1e-4, min_lr=1e-7, warmup_epochs=2, epochs=10,
                  warmup_lr_init=1e-6)
    sched = make_lr_schedule(conf, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(sched(20)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-7, rel=1e-2)


def test_lr_schedule_variants():
    """The reference's full scheduler surface (config.py:152) is honored."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_lr_schedule

    base = dict(lr=1e-4, min_lr=1e-6, warmup_epochs=2, epochs=10,
                warmup_lr_init=1e-6)
    # CosineAnnealingLR: starts at lr (no warmup), decays to min_lr
    s = make_lr_schedule(Config(scheduler='CosineAnnealingLR', **base), 10)
    assert float(s(0)) == pytest.approx(1e-4, rel=1e-3)
    assert float(s(100)) == pytest.approx(1e-6, rel=1e-2)
    # WarmupLinear: warmup then linear decay
    s = make_lr_schedule(Config(scheduler='WarmupLinear', **base), 10)
    assert float(s(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(s(20)) == pytest.approx(1e-4, rel=1e-3)
    assert float(s(60)) == pytest.approx(5.05e-5, rel=1e-2)  # halfway down
    assert float(s(100)) == pytest.approx(1e-6, rel=1e-2)
    # plateau schedule is constant (the reduction is an optax transform)
    s = make_lr_schedule(Config(scheduler='ReduceLROnPlateau', **base), 10)
    assert float(s(50)) == pytest.approx(1e-4, rel=1e-3)
    with pytest.raises(ValueError):
        make_lr_schedule(Config(scheduler='mystery', **base), 10)


def test_epoch_interval_schedule():
    """cosine_interval_type: 'epoch' holds the LR constant within an epoch."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import _maybe_epoch_quantize, make_lr_schedule
    conf = Config(lr=1e-4, min_lr=1e-7, warmup_epochs=0, epochs=10,
                  cosine_interval_type='epoch')
    sched = _maybe_epoch_quantize(make_lr_schedule(conf, 10), conf, 10)
    assert float(sched(10)) == float(sched(19))
    assert float(sched(19)) != float(sched(20))
    conf2 = Config(cosine_interval_type='weird')
    with pytest.raises(ValueError):
        _maybe_epoch_quantize(make_lr_schedule(conf2, 10), conf2, 10)


def test_reduce_on_plateau_optimizer():
    """ReduceLROnPlateau runs as an optax transform keyed on value=loss."""
    import optax
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_optimizer
    conf = Config(scheduler='ReduceLROnPlateau', patience=1, lr=1e-2)
    opt = make_optimizer(conf, steps_per_epoch=1)
    params = {'w': jnp.ones((3,))}
    state = opt.init(params)
    g = {'w': jnp.ones((3,))}
    # constant loss -> plateau triggers after patience, scale drops
    for i in range(6):
        updates, state = opt.update(g, state, params, value=jnp.float32(1.0))
        params = optax.apply_updates(params, updates)
    scale = float(state[-1].scale)
    assert scale < 1.0


def test_plateau_honors_factor_and_rejects_max_mode():
    import optax
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_optimizer
    conf = Config(scheduler='ReduceLROnPlateau', patience=1, lr=1e-2,
                  factor=0.5)
    opt = make_optimizer(conf, steps_per_epoch=1)
    params = {'w': jnp.ones((3,))}
    state = opt.init(params)
    g = {'w': jnp.ones((3,))}
    for _ in range(4):
        updates, state = opt.update(g, state, params, value=jnp.float32(1.0))
        params = optax.apply_updates(params, updates)
    # conf.factor (0.5), not the old hardcoded 0.1: after k triggers the
    # scale is 0.5**k (0.1**k would not be a power of 0.5)
    import math
    scale = float(state[-1].scale)
    assert 0 < scale < 1.0
    k = math.log(scale) / math.log(0.5)
    assert abs(k - round(k)) < 1e-5, scale

    conf.plateau_mode = 'max'
    with pytest.raises(ValueError, match='plateau_mode'):
        make_optimizer(conf, steps_per_epoch=1)


def test_amsgrad_optimizers_step():
    """conf.amsgrad builds a working AMSGrad variant for adam and adamw
    (reference config.py:130; previously silently ignored)."""
    import optax
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_optimizer
    for name in ('adam', 'adamw'):
        conf = Config(optimizer=name, amsgrad=True, lr=1e-2, epochs=1,
                      warmup_epochs=0)
        opt = make_optimizer(conf, steps_per_epoch=2)
        params = {'w': jnp.ones((3,))}
        state = opt.init(params)
        updates, state = opt.update({'w': jnp.ones((3,))}, state, params,
                                    value=jnp.float32(1.0))
        params = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(params['w'])))
        # amsgrad state carries the running max of nu
        flat = jax.tree_util.tree_flatten_with_path(state)[0]
        assert any('nu_max' in jax.tree_util.keystr(p) for p, _ in flat), name


def test_flash_attn_maps_to_pallas_attention():
    from srgd_tpu.config import Config
    from srgd_tpu.nn.unet import build_unet_from_config
    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4)
    assert build_unet_from_config(conf).use_pallas_attention is False
    conf.flash_attn = True
    assert build_unet_from_config(conf).use_pallas_attention is True


def test_shuffle_false_iterates_sequentially(image_dir):
    """conf.shuffle=False -> deterministic file order (one worker)."""
    from srgd_tpu.train.data import DegradationDataset
    ds = DegradationDataset(str(image_dir), crop_size=8, batch_size=2,
                            num_workers=1, seed=0, shuffle=False)
    # drive _sample directly: the cursor must walk files in order
    rng = np.random.default_rng(0)
    n = len(ds.files)
    seen = []
    orig = ds.files
    for _ in range(n):
        before = ds._cursor
        ds._sample(rng)
        seen.append(before % n)
    assert seen == list(range(n))
    assert ds.files == orig


def test_preprocess_modes(image_dir):
    from srgd_tpu.train.data import preprocess_crop
    rng = np.random.default_rng(0)
    img = np.asarray(Image.open(image_dir / 'im0.png'))
    for mode in ('randomcrop', 'centercrop', 'justresize', 'resize_randomcrop'):
        out = preprocess_crop(img, 32, mode, rng, scale_size=48)
        assert out.shape == (32, 32, 3), mode
    with pytest.raises(ValueError):
        preprocess_crop(img, 32, 'mystery', rng)
    # centercrop is deterministic
    a = preprocess_crop(img, 32, 'centercrop', np.random.default_rng(1))
    b = preprocess_crop(img, 32, 'centercrop', np.random.default_rng(2))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_validate_saves_samples(image_dir, tmp_path):
    from srgd_tpu.config import Config
    from srgd_tpu.factory import get_model
    from srgd_tpu.train.loop import validate
    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, num_sample_steps=2, val_num_sample_steps=2,
                  save_validation_sample=True, save_validation_hr_sample=True,
                  valid_preprocess='centercrop', valid_trans_mode='simple')
    wrapper, net, params = get_model(conf)
    sdir = str(tmp_path / 'samples')
    m = validate(conf, wrapper, params, str(image_dir), jax.random.PRNGKey(0),
                 num_images=2, sample_dir=sdir, step=7)
    assert np.isfinite(m['psnr'])
    files = sorted(os.listdir(sdir))
    assert any(f.startswith('sample_000007') for f in files)
    assert any(f.startswith('hr_000007') for f in files)

    # skip_sample (config.py:69) keeps the metrics but suppresses the PNGs
    conf.skip_sample = True
    sdir2 = str(tmp_path / 'samples2')
    m2 = validate(conf, wrapper, params, str(image_dir),
                  jax.random.PRNGKey(0), num_images=2, sample_dir=sdir2)
    assert np.isfinite(m2['psnr']) and not os.path.exists(sdir2)


@pytest.mark.slow
def test_train_loop_end_to_end(image_dir, tmp_path):
    """Full trainer: data -> steps -> checkpoint -> resume."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2, num_workers=1,
                  epochs=1, warmup_epochs=0, ema_decay=0.9, seed=0)
    out_dir = str(tmp_path / 'run')
    state = train(conf, str(image_dir), out_dir, total_steps=3,
                  log_every=1, save_every=2)
    assert int(state.step) == 3
    # checkpoints are named from conf.prefix (reference artifact layout)
    assert os.path.isdir(os.path.join(out_dir, conf.prefix))

    # resume continues from the saved step
    state2 = train(conf, str(image_dir), out_dir, total_steps=4,
                   log_every=1, save_every=10)
    assert int(state2.step) == 4

    # the best-loss snapshot is a file copy of the periodic checkpoint
    # (no second device_get) and must restore as a complete train state
    from srgd_tpu.checkpoint.io import restore_params
    best_dir = os.path.join(out_dir, f'{conf.prefix}_best_loss')
    assert os.path.isdir(best_dir)
    best = restore_params(best_dir)
    assert {'params', 'ema_params', 'opt_state', 'step',
            'best_score'} <= set(best)


def test_copy_checkpoint_crash_safe(tmp_path):
    from srgd_tpu.checkpoint.io import (copy_checkpoint, restore_params,
                                        save_params)
    src = str(tmp_path / 'src')
    dst = str(tmp_path / 'dst')
    save_params(src, {'a': np.arange(4), 'step': 7})
    copy_checkpoint(src, dst)
    assert int(restore_params(dst)['step']) == 7
    # overwrite path (dst exists): swap discipline, debris cleaned
    save_params(src, {'a': np.arange(4), 'step': 9})
    os.makedirs(dst + '.new', exist_ok=True)   # crash debris
    copy_checkpoint(src, dst)
    assert int(restore_params(dst)['step']) == 9
    assert not os.path.exists(dst + '.new') and not os.path.exists(dst + '.old')
    with pytest.raises(FileNotFoundError):
        copy_checkpoint(str(tmp_path / 'missing'), dst)


def test_train_rejects_quantized_config(tmp_path):
    """quantize: w8a8 is inference-only (QuantConv rounds with no STE, so a
    quantized train step gets ~zero conv gradients) — the trainer must
    reject it rather than silently fail to learn."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2, quantize='w8a8')
    with pytest.raises(ValueError, match='inference-only'):
        train(conf, 'unused', str(tmp_path / 'q'), total_steps=1)


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path, monkeypatch):
    """A stop-at-step-2 / resume-to-4 run must reproduce the uninterrupted
    4-step run exactly — i.e. Adam moments and schedule position survive the
    checkpoint (regression for the old resume dropping opt_state)."""
    import srgd_tpu.train.data as data_mod
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    rng = np.random.default_rng(0)
    hr = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    cond = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    label = np.zeros((2,), np.int64)

    class ConstData:
        def __init__(self, *a, **kw):
            pass

        def __iter__(self):
            while True:
                yield hr, cond, label

    monkeypatch.setattr(data_mod, 'DegradationDataset', ConstData)

    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2, num_workers=1,
                  epochs=1, warmup_epochs=0, ema_decay=0.9, seed=0,
                  scheduler='constant')  # schedule independent of total_steps

    sA = train(conf, 'unused', str(tmp_path / 'A'), total_steps=4,
               log_every=10, save_every=100)
    train(conf, 'unused', str(tmp_path / 'B'), total_steps=2,
          log_every=10, save_every=2)
    sB = train(conf, 'unused', str(tmp_path / 'B'), total_steps=4,
               log_every=10, save_every=100)

    assert int(sA.step) == int(sB.step) == 4
    for name, a, b in [('params', sA.params, sB.params),
                       ('ema', sA.ema_params, sB.ema_params),
                       ('opt', sA.opt_state, sB.opt_state)]:
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=0, err_msg=name)


@pytest.mark.slow
def test_sigterm_saves_tail_checkpoint_and_resumes(tmp_path, monkeypatch):
    """A SIGTERM mid-stint (the `timeout N train.loop` pattern) must save the
    steps since the last periodic save and stop cleanly, so stop-at-4 /
    resume-to-6 reproduces the uninterrupted 6-step run exactly even though
    save_every (100) never fired."""
    import signal

    import srgd_tpu.train.data as data_mod
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    rng = np.random.default_rng(0)
    hr = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    cond = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    label = np.zeros((2,), np.int64)

    class ConstData:
        signal_at = None   # batch index at which to deliver SIGTERM

        def __init__(self, *a, **kw):
            pass

        def __iter__(self):
            n = 0
            while True:
                n += 1
                if n == self.signal_at:
                    # raised from the producer (the loop's _DevicePrefetcher
                    # thread); CPython runs the handler in the main thread,
                    # which must finish its in-flight step, stop and save.
                    # The prefetch pipeline makes the exact stop step
                    # timing-dependent — the contract under test is
                    # stopped-early + exact resume, not the step count.
                    signal.raise_signal(signal.SIGTERM)
                yield hr, cond, label

    monkeypatch.setattr(data_mod, 'DegradationDataset', ConstData)
    prev_term = signal.getsignal(signal.SIGTERM)

    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2, num_workers=1,
                  epochs=1, warmup_epochs=0, ema_decay=0.9, seed=0,
                  scheduler='constant')

    sA = train(conf, 'unused', str(tmp_path / 'A'), total_steps=6,
               log_every=10, save_every=100)
    ConstData.signal_at = 4
    sB1 = train(conf, 'unused', str(tmp_path / 'B'), total_steps=6,
                log_every=10, save_every=100)
    ConstData.signal_at = None
    assert 1 <= int(sB1.step) < 6        # stopped early, mid-run
    assert signal.getsignal(signal.SIGTERM) == prev_term  # handler restored
    sB = train(conf, 'unused', str(tmp_path / 'B'), total_steps=6,
               log_every=10, save_every=100)

    assert int(sA.step) == int(sB.step) == 6
    for name, a, b in [('params', sA.params, sB.params),
                       ('ema', sA.ema_params, sB.ema_params),
                       ('opt', sA.opt_state, sB.opt_state)]:
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=0, err_msg=name)


def test_metrics():
    from srgd_tpu.utils.metrics import psnr, ssim
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 100
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    p = float(psnr(a, noisy))
    assert 15 < p < 25  # sigma 0.1 -> ~20 dB
    assert 0 < float(ssim(a, noisy)) < 1


def test_phase_timer():
    from srgd_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase('a'):
        pass
    with t.phase('a'):
        pass
    assert t.counts['a'] == 2 and 'a:' in t.report()


@pytest.mark.slow
def test_validate(image_dir):
    from srgd_tpu.config import Config
    from srgd_tpu.factory import get_model
    from srgd_tpu.train.loop import validate
    import jax
    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, num_sample_steps=2, val_num_sample_steps=2)
    wrapper, net, params = get_model(conf)
    m = validate(conf, wrapper, params, str(image_dir),
                 jax.random.PRNGKey(0), num_images=2)
    assert np.isfinite(m['psnr']) and -1 <= m['ssim'] <= 1


def test_lpips_math_and_converter():
    """LPIPS structure: zero at identity, positive and symmetric otherwise;
    torch-format converter round-trips through save/load."""
    from srgd_tpu.utils.lpips import (
        convert_torch_lpips, load_lpips_params, lpips, random_lpips_params,
        save_lpips_params)

    params = random_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    d_aa = lpips(a, a, params)
    d_ab = lpips(a, b, params)
    d_ba = lpips(b, a, params)
    assert d_aa.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-5)
    assert (np.asarray(d_ab) > 0).all()
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-5)

    # converter: synthetic torch-shaped state dicts (OIHW) -> pytree
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_sd, c_in = {}, 3
    for idx, w in zip(conv_idx, widths):
        vgg_sd[f'{idx}.weight'] = rng.normal(size=(w, c_in, 3, 3)).astype(np.float32)
        vgg_sd[f'{idx}.bias'] = np.zeros((w,), np.float32)
        c_in = w
    lin_sd = {f'lin{k}.model.1.weight':
              np.abs(rng.normal(size=(1, c, 1, 1)).astype(np.float32))
              for k, c in enumerate([64, 128, 256, 512, 512])}
    p2 = convert_torch_lpips(vgg_sd, lin_sd)
    d = lpips(a, b, p2)
    assert np.isfinite(np.asarray(d)).all()


def test_lpips_save_load_roundtrip(tmp_path):
    from srgd_tpu.utils.lpips import (
        load_lpips_params, lpips, random_lpips_params, save_lpips_params)
    params = random_lpips_params(jax.random.PRNGKey(1))
    path = str(tmp_path / 'lpips.npz')
    save_lpips_params(path, params)
    p2 = load_lpips_params(path)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(lpips(a, b, params)),
                               np.asarray(lpips(a, b, p2)), rtol=1e-6)


def test_best_lpips_requires_weights(tmp_path):
    """test_target: best_lpips without converted weights is a hard, named
    error — never a silently-degraded run."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train
    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2, test_target='best_lpips')
    with pytest.raises(NotImplementedError, match='lpips'):
        train(conf, 'unused', str(tmp_path / 'x'), total_steps=1)


def test_madgrad_matches_published_step():
    """srgd_tpu.train.madgrad == an independent numpy transcription of the
    published MADGRAD step (Defazio & Jelassi 2021 / the torch reference
    implementation), decoupled and coupled decay, over several steps."""
    from srgd_tpu.train.madgrad import madgrad

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr, mom, wd, eps = 0.05, 0.9, 0.01, 1e-6

    for decoupled in (True, False):
        # numpy re-derivation
        p = p0.copy()
        s = np.zeros_like(p)
        nu = np.zeros_like(p)
        x0 = p0.copy()
        for k, g in enumerate(grads):
            g = g.copy()
            lamb = lr * np.sqrt(k + 1.0)
            if decoupled:
                p = p * (1 - lr * wd)
            else:
                g = g + wd * p
            nu = nu + lamb * g * g
            s = s + lamb * g
            z = x0 - s / (np.cbrt(nu) + eps)
            p = mom * p + (1 - mom) * z
        want = p

        opt = madgrad(lr, momentum=mom, weight_decay=wd,
                      decoupled_decay=decoupled, eps=eps)
        params = {'w': jnp.asarray(p0)}
        state = opt.init(params)
        import optax
        for g in grads:
            updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params['w']), want,
                                   rtol=2e-5, atol=2e-6)


def test_madgrad_from_config_steps_and_honors_decay_knob():
    """optimizer: madgrad builds from the config (no longer a named reject)
    and madgrad_decoupled_decay changes the trajectory."""
    import optax
    from srgd_tpu.config import Config
    from srgd_tpu.train.trainer import make_optimizer

    outs = {}
    for dd in (True, False):
        conf = Config(optimizer='madgrad', lr=1e-2, weight_decay=0.1,
                      madgrad_decoupled_decay=dd, epochs=1, warmup_epochs=0)
        opt = make_optimizer(conf, steps_per_epoch=2)
        params = {'w': jnp.ones((3,))}
        state = opt.init(params)
        for _ in range(2):
            updates, state = opt.update({'w': jnp.ones((3,)) * 0.5}, state,
                                        params, value=jnp.float32(1.0))
            params = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(params['w'])))
        outs[dd] = np.asarray(params['w'])
    assert not np.allclose(outs[True], outs[False])


@pytest.mark.slow
def test_log_dir_writes_train_log(image_dir, tmp_path):
    """conf.log_dir (reference config.py:187) produces a run log file;
    relative paths resolve inside out_dir so runs are self-contained."""
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    conf = Config(model='continuous', unet_dim=8, ddpm_unet_dim_mults='1,2',
                  full_attn='False,True', learned_sinusoidal_cond=True,
                  learned_sinusoidal_dim=4, hr_image_size=32,
                  lr_image_size=8, batch_size=2, num_sample_steps=2,
                  epochs=1, warmup_epochs=0, num_workers=0)
    out = tmp_path / 'run'
    train(conf, str(image_dir), str(out), total_steps=1, log_every=1,
          save_every=10, resume=False)
    log = out / 'logs' / 'train.log'
    assert log.exists()
    assert 'step 1 loss' in log.read_text()


@pytest.mark.slow
def test_train_amp_uses_bf16_compute(image_dir, tmp_path):
    """amp: true -> TPU mixed precision: bfloat16 compute, f32 master
    params (the reference trainer's autocast analog; amp_dtype fp16 is
    accepted but bf16 is always used — no MXU fp16, no loss scaling)."""
    import jax
    import numpy as np
    from srgd_tpu.config import Config
    from srgd_tpu.train.loop import train

    conf = Config(model='conditional_continuous', unet_dim=8,
                  ddpm_unet_dim_mults='1,2', full_attn='False,True',
                  learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                  hr_image_size=16, lr_image_size=4, batch_size=2,
                  num_workers=1, epochs=1, warmup_epochs=0, ema_decay=0.9,
                  seed=0, amp=True)
    state = train(conf, str(image_dir), str(tmp_path / 'run'),
                  total_steps=2, log_every=1, save_every=10)
    assert int(state.step) == 2
    # train() mutated the working conf to bf16 compute
    assert conf.compute_dtype == 'bfloat16'
    # master params (and EMA) stay float32
    for p in jax.tree.leaves(state.params) + jax.tree.leaves(state.ema_params):
        assert p.dtype == np.float32
    # an explicit compute_dtype wins over amp
    conf2 = Config(model='conditional_continuous', unet_dim=8,
                   ddpm_unet_dim_mults='1,2', full_attn='False,True',
                   learned_sinusoidal_cond=True, learned_sinusoidal_dim=4,
                   hr_image_size=16, lr_image_size=4, batch_size=2,
                   num_workers=1, epochs=1, warmup_epochs=0, ema_decay=0.9,
                   seed=0, amp=True, compute_dtype='bfloat16')
    train(conf2, str(image_dir), str(tmp_path / 'run2'),
          total_steps=1, log_every=1, save_every=10)
    assert conf2.compute_dtype == 'bfloat16'


def test_save_params_crash_safe(tmp_path, monkeypatch):
    """A save that dies mid-write must never destroy the previous
    checkpoint (round 6: orbax force=True deleted the only copy of a
    30k-step state before the replacement was finalized)."""
    from srgd_tpu.checkpoint import io as ckio

    path = str(tmp_path / 'ckpt')
    ckio.save_params(path, {'w': np.arange(4.0), 'step': 1})

    # crash while writing the replacement: the tmp dir is half-written
    real_ckpt = ckio._checkpointer

    class Boom(RuntimeError):
        pass

    class ExplodingCkpt:
        def save(self, p, params, **kw):
            os.makedirs(p, exist_ok=True)
            (tmp_path / 'ckpt.new' / 'partial').write_text('garbage')
            raise Boom('simulated OOM kill mid-save')

    monkeypatch.setattr(ckio, '_checkpointer', lambda: ExplodingCkpt())
    with pytest.raises(Boom):
        ckio.save_params(path, {'w': np.arange(4.0) * 2, 'step': 2})
    monkeypatch.setattr(ckio, '_checkpointer', real_ckpt)

    # previous checkpoint intact and restorable
    assert int(ckio.restore_params(path)['step']) == 1
    # a later save cleans the debris and succeeds
    ckio.save_params(path, {'w': np.arange(4.0) * 3, 'step': 3})
    assert int(ckio.restore_params(path)['step']) == 3
    assert not os.path.exists(path + '.new')
    assert not os.path.exists(path + '.old')


def test_restore_params_mid_swap_fallbacks(tmp_path):
    """Crash between the two swap renames leaves <path>.new (and possibly
    <path>.old) as the only complete copies; restore + the trainer's
    resume gate must find them."""
    from srgd_tpu.checkpoint import io as ckio

    path = str(tmp_path / 'ckpt')
    ckio.save_params(path + '.new', {'step': 7})
    assert ckio.checkpoint_exists(path)
    assert int(ckio.restore_params(path)['step']) == 7

    os.rename(path + '.new', path + '.old')
    assert ckio.checkpoint_exists(path)
    assert int(ckio.restore_params(path)['step']) == 7

    assert not ckio.checkpoint_exists(str(tmp_path / 'nothing'))
