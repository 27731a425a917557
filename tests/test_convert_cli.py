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
