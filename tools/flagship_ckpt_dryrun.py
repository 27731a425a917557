"""Flagship-width checkpoint dry-run (VERDICT r1 #3).

Synthesizes a full reference-format state dict at the shipped flagship
geometry (dim 128, mults 1/2/4/8, learned-sinusoidal 32, 3 classes — the
ConditionalSRUnet the 550 MB epoch300 .pth holds, /root/reference/models/
srgd/conditional_continuous_linear_df8kost_dim128_epoch300.pth:3), saves it
with torch.save({'ema_model': ...}) exactly like the reference's trainer
did (model.py:3659-3664), then:

  1. loads it back through checkpoint/torch_convert.convert_checkpoint and
     asserts ZERO missing/unexpected keys at the real parameter count;
  2. runs the ACTUAL CLI (python -m srgd_tpu.infer) against the shipped
     YAML + this .pth on one small image, proving the torch.load ->
     convert -> tiled-sample path end-to-end at flagship width.

The real released checkpoint is an unfetchable Git-LFS pointer in this
environment; this attests the converter's key map is complete at 4 stages /
~137 M params so a real checkpoint loads first try.

Usage:  JAX_PLATFORMS=cpu python tools/flagship_ckpt_dryrun.py [workdir]
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir='/tmp/flagship_dryrun'):
    import torch
    from tests.torch_ref import make_state_dict

    os.makedirs(workdir, exist_ok=True)
    pth = os.path.join(workdir, 'flagship_synth.pth')

    t0 = time.time()
    sd = make_state_dict(dim=128, dim_mults=(1, 2, 4, 8),
                         full_attn=(False, False, False, True),
                         num_classes=3, learned_sinusoidal_dim=32, seed=0)
    wrapped = {f'model.{k}': v for k, v in sd.items()}
    n_params = sum(v.numel() for v in wrapped.values())
    torch.save({'ema_model': wrapped}, pth)
    size = os.path.getsize(pth)
    print(f'state dict: {len(wrapped)} keys, {n_params/1e6:.1f}M params, '
          f'{size/1e6:.1f} MB on disk ({time.time()-t0:.1f}s)')
    # the real artifact is 550,400,570 bytes of fp32 EMA weights (pth:3)
    assert 400e6 < size < 700e6, 'not flagship-sized'

    t0 = time.time()
    from srgd_tpu.checkpoint.torch_convert import convert_checkpoint
    params, missing, unexpected = convert_checkpoint(pth, num_stages=4)
    n_conv = sum(int(np.asarray(p).size)
                 for p in __import__('jax').tree.leaves(params))
    print(f'converted: {n_conv/1e6:.1f}M params, missing={missing}, '
          f'unexpected={unexpected} ({time.time()-t0:.1f}s)')
    assert not missing and not unexpected, (missing, unexpected)
    assert n_conv == n_params

    in_dir = os.path.join(workdir, 'in')
    out_dir = os.path.join(workdir, 'out')
    os.makedirs(in_dir, exist_ok=True)
    from PIL import Image
    Image.fromarray((np.random.default_rng(0).random((16, 16, 3)) * 255)
                    .astype(np.uint8)).save(os.path.join(in_dir, 'x.png'))
    out_png = os.path.join(out_dir, 'x_out.png')
    if os.path.exists(out_png):
        os.remove(out_png)

    t0 = time.time()
    env = dict(os.environ)
    env.setdefault('JAX_PLATFORMS', 'cpu')
    env['PYTHONPATH'] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    cmd = [sys.executable, '-m', 'srgd_tpu.infer',
           '-c', 'conf/conditional_continuous_linear_df8kost_dim128.yaml',
           '-m', pth, '--input_dir', in_dir, '--output_dir', out_dir,
           '--num_sample_steps', '2', '--test_label', '0']
    print('CLI:', ' '.join(cmd))
    subprocess.run(cmd, check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    im = Image.open(out_png)
    assert im.size == (64, 64), im.size
    print(f'CLI end-to-end OK: 16px -> {im.size} in {time.time()-t0:.1f}s')
    print('FLAGSHIP DRY-RUN PASSED')


if __name__ == '__main__':
    main(*sys.argv[1:])
