"""End-to-end CLI tests: tiny config, random init, real PNG in -> 4x PNG out,
resume-by-filename, and the reference's rename quirk."""

import os

import numpy as np
import pytest
from PIL import Image

TINY_YAML = """
model: conditional_continuous
noise_schedule: linear
num_sample_steps: 2
unet_dim: 8
ddpm_unet_dim_mults: '1,2'
full_attn: 'False,True'
learned_sinusoidal_cond: true
learned_sinusoidal_dim: 4
num_classes: 3
image_size: 64
"""


@pytest.fixture
def setup_dirs(tmp_path):
    conf = tmp_path / 'tiny.yaml'
    conf.write_text(TINY_YAML)
    in_dir = tmp_path / 'in'
    out_dir = tmp_path / 'out'
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(8, 12, 3), dtype=np.uint8)
    Image.fromarray(img).save(in_dir / 'a.png')
    return conf, in_dir, out_dir


def _run(conf, in_dir, out_dir, extra=()):
    from srgd_tpu.infer import main
    main(['-c', str(conf), '-m', '', '--input_dir', str(in_dir),
          '--output_dir', str(out_dir), '--num_sample_steps', '2',
          '--tile_size', '64', '--test_label', '0', '--seed', '71',
          *extra])


@pytest.mark.slow
def test_cli_end_to_end(setup_dirs, capsys):
    conf, in_dir, out_dir = setup_dirs
    _run(conf, in_dir, out_dir)
    out_path = out_dir / 'a_out.png'
    assert out_path.exists()
    out = Image.open(out_path)
    assert out.size == (12 * 4, 8 * 4)

    # determinism: rerun into a fresh dir gives identical bytes
    out2_dir = out_dir.parent / 'out2'
    _run(conf, in_dir, out2_dir)
    a = np.asarray(Image.open(out_path))
    b = np.asarray(Image.open(out2_dir / 'a_out.png'))
    np.testing.assert_array_equal(a, b)

    # resume: rerun skips the existing output
    _run(conf, in_dir, out_dir)
    assert 'skip' in capsys.readouterr().out


@pytest.mark.slow
def test_cli_jpg_rename_quirk(setup_dirs):
    """Reference only rewrites '.png' suffixes (inference.py:123) — a .jpg
    input saves under its original name. Parity kept."""
    conf, in_dir, out_dir = setup_dirs
    os.remove(in_dir / 'a.png')
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)).save(
        in_dir / 'b.jpg')
    _run(conf, in_dir, out_dir)
    assert (out_dir / 'b.jpg').exists()


@pytest.mark.slow
def test_cli_unreadable_input_skipped(setup_dirs, capsys):
    conf, in_dir, out_dir = setup_dirs
    (in_dir / 'broken.png').write_bytes(b'not an image')
    _run(conf, in_dir, out_dir)
    assert 'Invalid image' in capsys.readouterr().out
    assert (out_dir / 'a_out.png').exists()


@pytest.mark.slow
def test_cli_class_cfg(setup_dirs):
    conf, in_dir, out_dir = setup_dirs
    _run(conf, in_dir, out_dir, extra=['--class_cond_scale', '1.5'])
    assert (out_dir / 'a_out.png').exists()


def test_interpolation_always_bicubic():
    """docs/PARITY.md divergence #10: ANY --interpolation value maps to
    bicubic. The reference maps 'lanczos' to BICUBIC too but crashes with an
    UnboundLocalError on any other value (inference.py:66-69)."""
    from srgd_tpu.infer import upscale_bicubic
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, size=(9, 7, 3), dtype=np.uint8))
    base = np.asarray(upscale_bicubic(img, 4, 'bicubic'))
    assert base.shape == (36, 28, 3)
    for name in ('lanczos', 'bilinear', 'nearest', 'no-such-filter'):
        np.testing.assert_array_equal(
            np.asarray(upscale_bicubic(img, 4, name)), base)


@pytest.mark.slow
def test_precision_flag_clears_config_quantize(tmp_path):
    """--precision fp32/bf16 must win over a YAML that sets quantize: w8a8
    (e.g. the shipped *_tpu_serving.yaml) — a user asking for fp32 must not
    silently get int8 convs (ADVICE r1)."""
    from srgd_tpu.infer import build_model_and_opts, parse_args
    conf = tmp_path / 'q.yaml'
    conf.write_text(TINY_YAML + 'quantize: w8a8\nquantize_min_channels: 8\n')
    common = ['-c', str(conf), '-m', '', '--input_dir', 'x', '--output_dir',
              'y', '--tile_size', '64']
    _, net, _, _, _ = build_model_and_opts(
        parse_args(common + ['--precision', 'fp32']))
    assert net.quant is None
    _, net, _, _, _ = build_model_and_opts(
        parse_args(common + ['--precision', 'int8',
                             '--quantize_min_channels', '8']))
    assert net.quant == 'w8a8'


@pytest.mark.slow
def test_cli_mesh_multichip(setup_dirs):
    """Multi-chip serving path: 8-device data mesh, tile-DP inference."""
    conf, in_dir, out_dir = setup_dirs
    _run(conf, in_dir, out_dir, extra=['--mesh', '8,1'])
    assert (out_dir / 'a_out.png').exists()
    # identical result to the unsharded run (pure tile math)
    import numpy as np
    from PIL import Image
    out2 = out_dir.parent / 'out_nomesh'
    _run(conf, in_dir, out2)
    a = np.asarray(Image.open(out_dir / 'a_out.png')).astype(np.int16)
    b = np.asarray(Image.open(out2 / 'a_out.png')).astype(np.int16)
    # GSPMD reduction-order drift can flip a uint8 rounding boundary
    assert np.abs(a - b).max() <= 1
    assert (a != b).mean() < 0.05


@pytest.mark.slow
def test_cli_int8_calibrate_and_smooth(setup_dirs):
    """--precision int8 --quant_calibrate --quantize_smooth_alpha runs the
    PTQ-calibration path end to end (incl. the no-QuantConv no-op when
    min_channels exceeds every stage width of the tiny net)."""
    conf, in_dir, out_dir = setup_dirs
    _run(conf, in_dir, out_dir, extra=[
        '--precision', 'int8', '--quant_calibrate',
        '--quantize_min_channels', '0', '--quantize_smooth_alpha', '0.5'])
    assert (out_dir / 'a_out.png').exists()
    # min_channels above every width: calibration must be a clean no-op
    (out_dir / 'a_out.png').unlink()
    _run(conf, in_dir, out_dir, extra=[
        '--precision', 'int8', '--quant_calibrate',
        '--quantize_min_channels', '4096'])
    assert (out_dir / 'a_out.png').exists()


def test_evidence_cfg_ladder_variants(monkeypatch, capsys):
    """The q90 CFG measurement harness (tools/evidence_eval.run_cfg_ladder)
    builds the variant grid from env and routes each run correctly: the
    baseline carries no guidance kwargs, scale variants carry exactly one
    CFG axis (the dual-CFG guard forbids both), warmup points carry the
    start-steps knob, and wrong-label controls permute the class label."""
    import tools.evidence_eval as ev

    for k, v in {'EV_CFG': '1', 'EV_CFG_CLASSES': '1', 'EV_CFG_IMAGES': '1',
                 'EV_CFG_MODE': 'ddim:1.0-6', 'EV_CFG_CLASS_SCALES': '2',
                 'EV_CFG_WARM': '2@3', 'EV_CFG_COND_SCALES': '1.5',
                 'EV_CFG_WRONG': '1,2'}.items():
        monkeypatch.setenv(k, v)

    calls = []

    def fake_sample(cond01, label, steps, mode, **gk):
        calls.append((label, steps, mode, gk))
        return np.asarray(cond01, np.float32), 0.0

    from srgd_tpu.train.data import DegradeConfig
    from srgd_tpu.config import Config
    gen = np.random.default_rng(0)
    ev.run_cfg_ladder(fake_sample, 32, gen, DegradeConfig.from_conf(Config()))

    assert [c[:3] for c in calls] == [(1, 6, 'ddim:1.0')] * 4 + [
        (2, 6, 'ddim:1.0')] * 2          # wrong-label runs permute 1 -> 2
    assert calls[0][3] == {}                                   # baseline
    assert calls[1][3] == {'class_cond_scale': 2.0}
    assert calls[2][3] == {'class_cond_scale': 2.0,
                           'class_guidance_start_steps': 3}    # warmup
    assert calls[3][3] == {'cond_scale': 1.5}                  # other axis
    assert calls[4][3] == {}                                   # wrong s=1
    assert calls[5][3] == {'class_cond_scale': 2.0}            # wrong s=2
    # no variant ever sets both axes (reference dual-CFG guard parity)
    assert not any('cond_scale' in gk and 'class_cond_scale' in gk
                   for *_, gk in calls)
    out = capsys.readouterr().out
    assert 'CFG summary' in out and 'WRONG-label' in out
