"""Offline checkpoint-conversion CLI: torch .pth -> orbax dir -> factory."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from srgd_tpu.checkpoint.convert import main as convert_main
from srgd_tpu.checkpoint.io import restore_params
from srgd_tpu.checkpoint.torch_convert import convert_checkpoint
from tests.torch_ref import make_state_dict


def _write_ckpt(tmp_path):
    sd = make_state_dict(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                         num_classes=3, learned_sinusoidal_dim=4, seed=7)
    wrapped = {f'model.{k}': v for k, v in sd.items()}
    path = str(tmp_path / 'ref.pth')
    torch.save({'ema_model': wrapped}, path)
    return path


def _write_conf(tmp_path):
    conf = tmp_path / 'conf.yaml'
    conf.write_text(
        'model: conditional_continuous\n'
        'unet_dim: 8\n'
        "ddpm_unet_dim_mults: '1,2'\n"
        "full_attn: 'False,True'\n"
        'learned_sinusoidal_cond: true\n'
        'learned_sinusoidal_dim: 4\n')
    return str(conf)


def test_convert_cli_roundtrip(tmp_path):
    ckpt = _write_ckpt(tmp_path)
    conf = _write_conf(tmp_path)
    out = str(tmp_path / 'orbax')
    convert_main(['-c', conf, '-m', ckpt, '-o', out])

    restored = restore_params(out)
    direct, _, _ = convert_checkpoint(ckpt, num_stages=2)
    la, lb = jax.tree.leaves(restored), jax.tree.leaves(direct)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converted_dir_loads_through_factory(tmp_path):
    ckpt = _write_ckpt(tmp_path)
    conf_path = _write_conf(tmp_path)
    out = str(tmp_path / 'orbax')
    convert_main(['-c', conf_path, '-m', ckpt, '-o', out])

    from srgd_tpu.config import load_config
    from srgd_tpu.factory import get_model
    conf = load_config(conf_path)
    conf.num_sample_steps = 2
    wrapper, net, params = get_model(conf, ckpt_path=out)
    cond = jnp.zeros((1, 16, 16, 3))
    sample = wrapper.sample(params, jax.random.PRNGKey(0), cond,
                            jnp.asarray([0]))
    assert sample.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(sample)).all()


def test_reverse_unet_round_trip():
    """flax -> torch is the exact inverse of torch -> flax: same key set,
    bitwise-equal tensors (proves the forward key map bijective over the
    full module surface: both attention kinds, Downsample, PixelShuffle
    upsample, bare final-stage convs, class conditioning)."""
    from srgd_tpu.checkpoint.torch_convert import (
        convert_unet_state_dict, flax_to_torch_unet_state_dict)

    for ps in (True, False):
        sd = make_state_dict(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                             num_classes=3, learned_sinusoidal_dim=4,
                             pixel_shuffle=ps, seed=11)
        sd = {k: v.numpy() for k, v in sd.items()}
        params, unmatched = convert_unet_state_dict(sd, num_stages=2)
        assert not unmatched
        back = flax_to_torch_unet_state_dict(params,
                                             pixel_shuffle_upsample=ps)
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_reverse_cli_exports_reference_format(tmp_path):
    """torch .pth -> orbax -> (--reverse) -> .pth round-trips through the
    CLI; the exported file is reference-format ('ema_model', 'model.'
    prefixes) and tensor-identical to the original."""
    ckpt = _write_ckpt(tmp_path)
    conf = _write_conf(tmp_path)
    orbax_dir = str(tmp_path / 'orbax')
    convert_main(['-c', conf, '-m', ckpt, '-o', orbax_dir])

    exported = str(tmp_path / 'exported.pth')
    convert_main(['-c', conf, '--reverse', '-m', orbax_dir, '-o', exported])

    orig = torch.load(ckpt, map_location='cpu',
                      weights_only=True)['ema_model']
    back = torch.load(exported, map_location='cpu',
                      weights_only=True)['ema_model']
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k].numpy(), orig[k].numpy(),
                                      err_msg=k)


def test_reverse_exports_learned_log_snr():
    """The learned monotonic log-SNR net exports back to its torch
    Sequential keys (wrapper level, no 'model.' prefix)."""
    from srgd_tpu.checkpoint.torch_convert import (
        _LEARNED_LOG_SNR_KEYS, convert_learned_log_snr,
        export_torch_state_dict, strip_wrapper_prefix)

    sd = make_state_dict(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                         learned_sinusoidal_dim=4, seed=3)
    wrapped = {f'model.{k}': v.numpy() for k, v in sd.items()}
    rng = np.random.default_rng(0)
    for tk in _LEARNED_LOG_SNR_KEYS:
        shape = (1, 1) if 'weight' in tk else (1,)
        wrapped[tk] = rng.standard_normal(shape).astype(np.float32)
    unet_sd, extras = strip_wrapper_prefix(wrapped)
    from srgd_tpu.checkpoint.torch_convert import convert_unet_state_dict
    params, _ = convert_unet_state_dict(unet_sd, num_stages=2)
    tree = {'params': params,
            'log_snr': convert_learned_log_snr(extras)}
    back = export_torch_state_dict(tree, model='continuous')
    for tk in _LEARNED_LOG_SNR_KEYS:
        np.testing.assert_array_equal(back[tk], wrapped[tk], err_msg=tk)
    assert set(back) == set(wrapped)
