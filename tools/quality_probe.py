"""Quantify reduced-precision sampling divergence on real shapes.

The reference samples fp32; this probe runs the SAME tiled sampling
(identical keys, random flagship-shape weights) in each requested mode and
reports PSNR of every mode against the first — evidence for the 0.1 dB
parity budget under bf16 / W8A8-int8 compute.

Env knobs: QP_LR (128), QP_STEPS (50), QP_DIM (128),
QP_MODES ('float32,bfloat16'; 'w8a8' = bf16 + calibrated int8-MXU convs,
'w8a8dyn' = same with dynamic activation scales, 'w8a8t' = per-timestep
calibrated scales; append '@<alpha>' for
SmoothQuant smoothing, e.g. 'w8a8dyn@0.5'; append '%<cal_mode>' for the
calibration scale estimator, e.g. 'w8a8%p99.9'), QP_QMIN (0 — only
quantize blocks >= this many channels), QP_WSEED/QP_CSEED (0/1 — weight
and condition seeds, for replicating results across draws),
QP_CONF (YAML path overriding the flagship conf; with it QP_DIM is
ignored), QP_CKPT (orbax train-checkpoint dir: use its TRAINED ema
weights instead of random init — the trained-weights ladder).
Run on the TPU chip: python tools/quality_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgd_tpu.utils.platform import enable_compile_cache, sync_platform_env

sync_platform_env()   # honor JAX_PLATFORMS=cpu for CPU direction checks
enable_compile_cache()   # ladders re-run the same per-mode programs

import jax
import jax.numpy as jnp


def main():
    lr = int(os.environ.get('QP_LR', 128))
    steps = int(os.environ.get('QP_STEPS', 50))
    dim = int(os.environ.get('QP_DIM', 128))

    from srgd_tpu.factory import build_wrapper
    from srgd_tpu.nn.unet import build_unet_from_config
    import __graft_entry__ as ge

    wseed = int(os.environ.get('QP_WSEED', 0))
    cseed = int(os.environ.get('QP_CSEED', 1))
    hr = lr * 4
    rng = jax.random.PRNGKey(71)
    cond = jax.random.uniform(jax.random.PRNGKey(cseed), (1, hr, hr, 3),
                              jnp.float32)
    label = jnp.zeros((1,), jnp.int32)

    modes = os.environ.get('QP_MODES', 'float32,bfloat16').split(',')

    if os.environ.get('QP_CONF'):
        from srgd_tpu.config import load_config
        conf = load_config(os.environ['QP_CONF'])
    else:
        conf = ge._flagship_conf(unet_dim=dim)
    ckpt = os.environ.get('QP_CKPT', '')
    outs = {}
    for mode in modes:
        # '<mode>+dcN' / '+dcN.D' / '+dcN.D@SCHED': DeepCache fast sampling
        # at interval N, split stage D (default 2), optional non-uniform
        # refresh schedule with '/'-separated segments (base.refresh_mask) —
        # e.g. 'bfloat16+dc3', 'w8a8+dc2.3', 'bfloat16+dc2.2@0.5x3/0.5x1'
        mode_q, _, dc_spec = mode.partition('+dc')
        conf.deep_cache_interval = 0
        conf.deep_cache_schedule = ''
        if dc_spec:
            dc_spec, _, sched = dc_spec.partition('@')
            conf.deep_cache_schedule = sched
            n, _, d = dc_spec.partition('.')
            conf.deep_cache_interval = int(n)
            conf.deep_cache_depth = int(d) if d else 2
        # 'w8a8@0.5' / 'w8a8dyn@0.5': SmoothQuant smoothing with that alpha
        base, _, suffix = mode_q.partition('@')
        is_q = base.startswith('w8a8')
        # 'w8a8%p99.9' / 'w8a8%mse': calibration scale estimator
        # (quant.py _cal_amax; VERDICT r2 #9 experiment)
        base, _, cal_mode = base.partition('%')
        conf.compute_dtype = 'bfloat16' if is_q else base
        conf.quantize = 'w8a8' if is_q else 'none'
        conf.quantize_min_channels = int(os.environ.get('QP_QMIN', 0))
        conf.quantize_smooth_alpha = float(suffix) if suffix else 0.0
        conf.quantize_cal_mode = cal_mode or 'max'
        net = build_unet_from_config(conf)
        wrapper = build_wrapper(conf, net)
        if ckpt:
            from srgd_tpu.checkpoint.io import restore_params
            raw = restore_params(ckpt)
            params = {'params': raw['ema_params']['params']}
            params = jax.tree.map(jnp.asarray, params)
        else:
            params = jax.jit(lambda k: net.init(
                k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
                cond=jnp.zeros((1, 256, 256, 3)),
                class_label=jnp.zeros((1,), jnp.int32)))(
                    jax.random.PRNGKey(wseed))
        if conf.compute_dtype == 'bfloat16':
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        if base in ('w8a8', 'w8a8t'):
            from srgd_tpu.nn.quant import calibrate_sampler
            params = calibrate_sampler(
                wrapper, params, jax.random.PRNGKey(7),
                cond_sample=cond * 2.0 - 1.0, per_time=(base == 'w8a8t'))
        # 'w8a8dyn': no calibration -> dynamic per-call amax scales
        t0 = time.time()
        out = wrapper.tiled_sample(params, rng, cond, label, batch_size=8,
                                   tile_size=256, num_sample_steps=steps,
                                   host_loop=True)
        out = np.asarray(out, np.float32)
        print(f'{mode}: sampled {hr}px, {steps} steps in '
              f'{time.time() - t0:.1f}s', flush=True)
        outs[mode] = out
        if os.environ.get('QP_SAVE_DIR'):
            # persist each canvas as it lands: the TPU relay can die
            # mid-ladder, and completed modes are capture-it-now data
            os.makedirs(os.environ['QP_SAVE_DIR'], exist_ok=True)
            # sanitize: schedule modes contain '/' ('+dc3.2@0.5x5/0.5x2')
            # which np.save would treat as a subdirectory
            fname = mode.replace('@', '_a').replace('/', '-')
            np.save(os.path.join(os.environ['QP_SAVE_DIR'],
                                 f'{fname}.npy'), out)
        # compare-as-you-go for the same reason (the reference mode is
        # always modes[0], so it lands before every comparison target)
        ref = modes[0]
        if mode != ref and ref in outs:
            a, b = outs[ref], out
            mse = float(np.mean((a - b) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-20))
            # PSNR of each vs the quantized-to-uint8 other (what users see)
            qa = np.round(a * 255) / 255
            qb = np.round(b * 255) / 255
            mse_q = float(np.mean((qa - qb) ** 2))
            print(f'{mode} vs {ref}: PSNR {psnr:.2f} dB  '
                  f'(max|d| {np.abs(a - b).max():.4f}, uint8-quantized PSNR '
                  f'{-10 * np.log10(max(mse_q, 1e-20)):.2f} dB)', flush=True)


if __name__ == '__main__':
    main()
