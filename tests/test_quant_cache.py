"""Calibration-cache tests (nn/quant.py save/load_calibration).

The calibrate phase costs ~3.5 min on the flagship; the cache persists the
recorded ``quant_stats`` collections across daemon restarts / bench runs.
These tests pin: lossless round-trip (global and per-time), the
fingerprint-mismatch miss path (a silent key drop would fall back to
dynamic scales — a quiet perf/quality change), corrupt-file rejection,
and the CLI plumbing. TPU-serving addition with no reference counterpart
(the reference samples fp32 end to end, /root/reference/inference.py:83-84).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srgd_tpu.factory import build_wrapper
from srgd_tpu.nn.quant import (calibrate_sampler, calibration_fingerprint,
                               load_calibration, save_calibration)
from tests.test_quant import _init_net, _tiny_conf


def _calibrated(conf, per_time=False):
    net, params = _init_net(conf)
    wrapper = build_wrapper(conf, net)
    pc = calibrate_sampler(wrapper, params, jax.random.PRNGKey(7),
                           tile_size=16, batch=2, per_time=per_time)
    return net, params, pc


def _assert_trees_equal(a, b):
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cache_roundtrip_global(tmp_path):
    conf = _tiny_conf()
    net, params, pc = _calibrated(conf)
    fp = calibration_fingerprint(conf, tile_size=16, batch=2)
    path = tmp_path / 'cal.npz'
    save_calibration(path, pc, fp)
    loaded = load_calibration(path, params, fp)
    assert loaded is not None
    _assert_trees_equal(pc['quant_stats'], loaded['quant_stats'])

    # the forward with loaded stats is bitwise the calibrated forward
    x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,))
    lb = jnp.zeros((2,), jnp.int32)
    yc = net.apply(pc, x, t, cond=x, class_label=lb)
    yl = net.apply(loaded, x, t, cond=x, class_label=lb)
    np.testing.assert_array_equal(np.asarray(yc), np.asarray(yl))


@pytest.mark.slow
def test_cache_roundtrip_per_time(tmp_path):
    conf = _tiny_conf()
    _, params, pc = _calibrated(conf, per_time=True)
    assert 'quant_stats_t' in pc and 'quant_stats_times' in pc
    fp = calibration_fingerprint(conf, tile_size=16, batch=2, per_time=True)
    path = tmp_path / 'cal_t.npz'
    save_calibration(path, pc, fp)
    loaded = load_calibration(path, params, fp)
    assert loaded is not None
    _assert_trees_equal(pc['quant_stats_t'], loaded['quant_stats_t'])
    np.testing.assert_array_equal(np.asarray(pc['quant_stats_times']),
                                  np.asarray(loaded['quant_stats_times']))


def test_cache_fingerprint_mismatch_returns_none(tmp_path, caplog):
    conf = _tiny_conf()
    _, params, pc = _calibrated(conf)
    fp = calibration_fingerprint(conf, tile_size=16, batch=2)
    path = tmp_path / 'cal.npz'
    save_calibration(path, pc, fp)

    other = _tiny_conf(quantize_min_channels=16)
    fp2 = calibration_fingerprint(other, tile_size=16, batch=2)
    with caplog.at_level('WARNING'):
        assert load_calibration(path, params, fp2) is None
    assert 'quantize_min_channels' in caplog.text


@pytest.mark.slow
def test_cache_rejects_corrupt_file(tmp_path):
    conf = _tiny_conf()
    _, params, _ = _calibrated(conf)
    fp = calibration_fingerprint(conf)
    path = tmp_path / 'not_a_cache.npz'
    np.savez(path, stray=np.zeros(3))
    with pytest.raises(ValueError, match='not a calibration cache'):
        load_calibration(path, params, fp)


def test_save_without_calibration_raises(tmp_path):
    conf = _tiny_conf()
    _, params = _init_net(conf)
    with pytest.raises(ValueError, match='quant_stats'):
        save_calibration(tmp_path / 'x.npz', params,
                         calibration_fingerprint(conf))


@pytest.mark.slow
def test_cli_cache_skips_recalibration(tmp_path, monkeypatch):
    """Second CLI build with the same cache must load it and never call
    calibrate_sampler; a checkpoint-identity change must recalibrate."""
    from srgd_tpu import infer as infer_mod
    from srgd_tpu.infer import build_model_and_opts, parse_args
    from tests.test_cli import TINY_YAML

    conf = tmp_path / 'tiny.yaml'
    conf.write_text(TINY_YAML)
    cache = tmp_path / 'cal.npz'
    common = ['-c', str(conf), '-m', '', '--input_dir', 'x',
              '--output_dir', 'y', '--tile_size', '16', '--batch_size', '2',
              '--precision', 'int8', '--quantize_min_channels', '8',
              '--quant_calibrate', '--quant_calibrate_cache', str(cache)]

    _, _, p1, _, _ = build_model_and_opts(parse_args(common))
    assert cache.exists() and 'quant_stats' in p1

    import srgd_tpu.nn.quant as quant_mod

    def _boom(*a, **kw):
        raise AssertionError('calibrate_sampler ran despite a valid cache')
    monkeypatch.setattr(quant_mod, 'calibrate_sampler', _boom)
    _, _, p2, _, _ = build_model_and_opts(parse_args(common))
    _assert_trees_equal(p1['quant_stats'], p2['quant_stats'])
