"""Inference CLI — drop-in surface parity with the reference's inference.py.

Usage (parity: /root/reference/inference.py:21-44, inference_sample.sh):

    python -m srgd_tpu.infer -c conf.yaml -m ckpt.pth \
        --input_dir IN --output_dir OUT [--test_label 0 --class_cond_scale 1.0
        --seed 71 --num_sample_steps 250 ...]

Behavioral parity kept: per-image re-seeding (inference.py:81), x4 bicubic
PIL pre-upscale (inference.py:71-73), skip-existing resume by output filename
(inference.py:126-127), unreadable-input skip (inference.py:101-106), the
'.png'->'_out.png' rename quirk (inference.py:123), 'lanczos' silently mapping
to bicubic (inference.py:66-69), x4 output-shape assert (inference.py:96-97),
and the accepted-but-unused --backend flag (inference.py:42).

TPU-native additions: --precision fp32/bf16, --matmul_precision, and jitted
samplers cached per canvas shape so a batch of same-sized images compiles once.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time
from functools import partial

import numpy as np

logger = logging.getLogger('srgd_tpu')


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('-c', '--conf', required=True, help='Path to config file')
    p.add_argument('-m', '--ckpt_path', type=str, required=True)
    p.add_argument('--input_dir', type=str, required=True)
    p.add_argument('--output_dir', type=str, required=True)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--num_sample_steps', type=int, default=250)
    p.add_argument('--interpolation', type=str, default='bicubic')
    p.add_argument('--cond_scale', type=float, default=1.0)
    p.add_argument('--class_cond_scale', type=float, default=1.0)
    p.add_argument('--guidance_start_steps', type=int, default=0)
    p.add_argument('--class_guidance_start_steps', type=int, default=0)
    p.add_argument('--generation_start_steps', type=int, default=0)
    p.add_argument('--start_index', type=int, default=0)
    p.add_argument('--end_index', type=int, default=None)
    p.add_argument('--test_label', type=int, default=None)
    p.add_argument('--no_amp', dest='amp', action='store_false')
    p.add_argument('--no_dpmpp_solver', dest='use_dpmpp_solver', action='store_false')
    p.add_argument('--continuous_sampler', type=str, default=None,
                   choices=['ancestral', 'ddim', 'dpmpp'],
                   help='continuous-family sampler (default: config; ddim = '
                        'eta-DDIM, dpmpp = DPM-Solver++(2M) multistep — both '
                        'usable at far fewer steps)')
    p.add_argument('--ddim_eta', type=float, default=None,
                   help="stochasticity of --continuous_sampler ddim: 0 = "
                        "deterministic (default), 1 = ancestral-equivalent")
    p.add_argument('--seed', type=int, default=71)
    p.add_argument('--backend', type=str, default='ddp')  # accepted, unused (parity)
    # TPU-native additions
    p.add_argument('--precision', type=str, default='fp32',
                   choices=['fp32', 'bf16', 'int8'],
                   help='int8: bf16 compute with W8A8 int8-MXU U-Net convs, '
                        'dynamic activation scales (quality evidence: '
                        'docs/PERF.md)')
    p.add_argument('--quantize_min_channels', type=int, default=512,
                   help='with --precision int8: only quantize U-Net blocks '
                        'this wide or wider. 512 (default) = deepest stages '
                        'only, bf16-class output quality; 0 = every stage, '
                        'fastest but measurably lossier (docs/PERF.md)')
    p.add_argument('--quantize_smooth_alpha', type=float, default=0.0,
                   help='with --precision int8: >0 enables SmoothQuant '
                        'per-input-channel smoothing with this alpha '
                        '(nn/quant.py); widens usable int8 coverage')
    p.add_argument('--quant_calibrate_per_time', action='store_true',
                   help='with --quant_calibrate: record a separate scale '
                        'set per calibration noise level and select the '
                        'nearest per sampling step (activations shrink as '
                        'noise decays; one global running-max over-scales '
                        'the low-noise steps)')
    p.add_argument('--quant_cal_mode', type=str, default='max',
                   help="with --quant_calibrate: per-call scale estimator "
                        "the running max aggregates — 'max' (amax) or "
                        "'p<pct>' (|x| percentile, e.g. p99.9: clips the "
                        "outlier tail — measured WORSE than max at flagship "
                        "shapes, the tails carry signal; docs/PERF.md)")
    p.add_argument('--quant_calibrate', action='store_true',
                   help='with --precision int8: record static activation '
                        'scales once (PTQ calibration) instead of per-call '
                        'dynamic amax — fastest serving mode, slightly '
                        'larger output divergence')
    p.add_argument('--quant_calibrate_cache', type=str, default='',
                   help='with --quant_calibrate: .npz path to persist the '
                        'recorded scales; a later start that fingerprints '
                        'to the same model/checkpoint/sampling setup loads '
                        'it and skips the calibrate phase (~3.5 min on the '
                        'flagship), any mismatch recalibrates and rewrites')
    p.add_argument('--deep_cache', type=int, default=0,
                   help='>1: DeepCache-style fast sampling — recompute the '
                        'U-Net deep half only every Nth step (per grid '
                        'parity when tiled), reusing the cached deep '
                        'feature in between. Training-free approximation; '
                        'quality ladder in docs/PERF.md. 0/1 = exact')
    p.add_argument('--deep_cache_depth', type=int, default=2,
                   help='U-Net stage where the cached deep half starts '
                        '(1..n_stages-1); smaller skips more compute but '
                        'stores a bigger per-tile cache')
    p.add_argument('--deep_cache_schedule', type=str, default='',
                   help="non-uniform refresh positions as COUNTxINTERVAL "
                        "segments in sampling order, e.g. '0.5x3/0.5x1' = "
                        "refresh every 3rd step in the high-noise half, "
                        "every step in the low-noise half; '' = uniform "
                        "every --deep_cache-th step")
    p.add_argument('--matmul_precision', type=str, default='default',
                   choices=['default', 'high', 'highest'])
    p.add_argument('--tile_size', type=int, default=256)
    p.add_argument('--exec_mode', type=str, default='host',
                   choices=['host', 'scan'],
                   help='host: per-step jitted loop (required on remote-compile '
                        'TPU deployments); scan: single jitted lax.scan program')
    p.add_argument('--use_pallas', action='store_true',
                   help='enable fused Pallas kernels (TPU only)')
    p.add_argument('--mesh', type=str, default='',
                   help="device mesh 'data,model' for multi-chip serving, "
                        "e.g. '8,1': tiles data-parallel over ICI, weights "
                        "replicated (SURVEY.md section 5.8)")
    return p.parse_args(argv)


def try_open_image(image_path):
    """Parity: inference.py:101-106."""
    from PIL import Image
    try:
        return Image.open(image_path).convert('RGB')
    except (IOError, SyntaxError):
        return None


def upscale_bicubic(image, scale: int = 4, interpolation: str = 'bicubic'):
    """PIL x{scale} pre-upscale. ANY interpolation string maps to bicubic:
    the reference maps both of its accepted values ('bicubic', 'lanczos')
    to BICUBIC and crashes (UnboundLocalError) on anything else
    (inference.py:66-73) — we keep the quirk and extend the bicubic mapping
    to unknown values instead of crashing (docs/PARITY.md divergence #10)."""
    from PIL import Image
    width, height = image.size
    resample = Image.BICUBIC
    return image.resize((width * scale, height * scale), resample=resample)


class SamplerCache:
    """Jitted tiled samplers keyed by canvas shape (+ step count).

    With a mesh, the condition canvas is row-sharded over the data axis
    (tile extraction reshapes keep the partition on the tile axis, so the
    denoiser runs tile-data-parallel) and weights are replicated.
    """

    def __init__(self, wrapper, params, opts, mesh=None):
        import jax
        self.jax = jax
        self.wrapper = wrapper
        self.mesh = mesh
        if mesh is not None:
            from srgd_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self.opts = opts
        self._cache = {}

    def sample(self, cond_np: np.ndarray, label, seed: int,
               guidance: dict | None = None) -> np.ndarray:
        """cond_np: (B, H, W, C) in [0,1]; label: None, int (applied to every
        canvas), or per-canvas (B,) array; returns (B, 4H, 4W, C).

        ``guidance`` optionally overrides the CFG knobs for THIS call
        (cond_scale / class_cond_scale / *_start_steps) — the serving
        daemon's per-request guidance (the measured recipe is per-class,
        docs/PERF.md q90). Each distinct scale is its own compiled
        program (both here and in the wrapper's host-loop cache)."""
        import jax
        import jax.numpy as jnp
        if label is not None:
            label = np.broadcast_to(
                np.asarray(label, np.int32).reshape(-1), (cond_np.shape[0],))
        o = self.opts
        if guidance:
            o = {**o, **guidance}
        fn = partial(self.wrapper.tiled_sample,
                     batch_size=o['batch_size'], tile_size=o['tile_size'],
                     tile_stride=o.get('tile_stride'),
                     cond_scale=o['cond_scale'],
                     guidance_start_steps=o['guidance_start_steps'],
                     class_cond_scale=o['class_cond_scale'],
                     class_guidance_start_steps=o['class_guidance_start_steps'],
                     generation_start_steps=o['generation_start_steps'],
                     num_sample_steps=o['num_sample_steps'])
        if o.get('exec_mode', 'host') == 'host':
            # per-step jit caching happens inside the wrapper
            jitted = (lambda p, r, c: fn(p, r, c, host_loop=True)) if label is None                 else (lambda p, r, c, l: fn(p, r, c, l, host_loop=True))
        else:
            # label presence changes the jitted fn's arity — key on it
            # (and on the guidance point: scales are trace-time constants)
            key = (cond_np.shape, o['num_sample_steps'], label is None,
                   o['cond_scale'], o['class_cond_scale'],
                   o['guidance_start_steps'], o['class_guidance_start_steps'])
            if key not in self._cache:
                if label is None:
                    self._cache[key] = jax.jit(lambda p, r, c: fn(p, r, c))
                else:
                    self._cache[key] = jax.jit(lambda p, r, c, l: fn(p, r, c, l))
            jitted = self._cache[key]
        rng = jax.random.PRNGKey(seed)  # re-seeded per image (inference.py:81)
        cond = jnp.asarray(cond_np)
        if self.mesh is not None:
            from srgd_tpu.parallel.mesh import canvas_sharding
            cond = jax.device_put(cond, canvas_sharding(self.mesh))
            # set_mesh makes the ambient mesh visible at trace time so the
            # fused Pallas blocks can shard_map over the data axis
            # (layers._fused_shard_wrap); the legacy `with mesh` context
            # keeps PartitionSpec axis-name resolution for the tiled sampler
            with jax.sharding.set_mesh(self.mesh), self.mesh:
                out = jitted(self.params, rng, cond) if label is None else \
                    jitted(self.params, rng, cond, jnp.asarray(label))
            return np.asarray(out)
        if label is None:
            out = jitted(self.params, rng, cond)
        else:
            out = jitted(self.params, rng, cond, jnp.asarray(label))
        return np.asarray(out)


def sr_target_image(image, sampler: SamplerCache, scale: int = 4,
                    test_label=None, interpolation: str = 'bicubic',
                    seed: int = 71):
    """Super-resolve one PIL image. Parity: inference.py:59-98."""
    from PIL import Image
    width, height = image.size
    upscaled = upscale_bicubic(image, scale, interpolation)
    cond = np.asarray(upscaled, dtype=np.float32)[None] / 255.0  # (1,H,W,3) [0,1]

    out = sampler.sample(cond, test_label, seed)[0]  # (H,W,3) in [0,1]
    arr = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
    sr_img = Image.fromarray(arr)

    new_width, new_height = sr_img.size
    assert width * 4 == new_width
    assert height * 4 == new_height
    return sr_img


def pending_outputs(input_dir, output_dir, start_index=0, end_index=None,
                    verbose_skip=False):
    """Yield (input_path, output_path) for inputs whose output doesn't exist
    yet — the reference's sorted-glob + skip-existing + '.png'->'_out.png'
    rename semantics (inference.py:120-127), shared by the batch CLI and the
    serving daemon's watch front-end. ``verbose_skip`` reproduces the
    reference's 'skip' print (noise the polling daemon doesn't want)."""
    for filename in sorted(glob.glob(f'{input_dir}/*'))[start_index:end_index]:
        save_filename = os.path.basename(filename).replace('.png', '_out.png')
        save_path = os.path.join(output_dir, save_filename)
        if os.path.exists(save_path):
            if verbose_skip:
                print('skip')
            continue
        yield filename, save_path


def batch_sr_target_images(input_dir, output_dir, sampler: SamplerCache,
                           scale=4, test_label=None, start_index=0,
                           end_index=None, interpolation='bicubic', seed=71):
    """Parity: inference.py:108-142 (sorted glob, skip-existing, rename quirk)."""
    print(f'save images at: {output_dir}')
    os.makedirs(output_dir, exist_ok=True)

    for filename, save_path in pending_outputs(input_dir, output_dir,
                                               start_index, end_index,
                                               verbose_skip=True):
        image = try_open_image(filename)
        if image is None:
            print('Invalid image or unable to open image:', filename)
            continue
        t0 = time.time()
        sr_img = sr_target_image(image, sampler, scale=scale,
                                 test_label=test_label,
                                 interpolation=interpolation, seed=seed)
        sr_img.save(save_path)
        mpix = sr_img.size[0] * sr_img.size[1] / 1e6
        logger.info('%s -> %s  (%.2f MPix in %.2fs)', filename, save_path,
                    mpix, time.time() - t0)


def build_model_and_opts(args):
    """Config -> model -> (wrapper, net, params, sampler opts, mesh).

    Shared by the batch CLI (this module) and the serving daemon
    (srgd_tpu.serve). ``args`` needs the sampling/precision flag surface of
    ``parse_args``. CLI-mutates-config parity: reference inference.py:148-152."""
    from srgd_tpu.config import load_config
    conf = load_config(args.conf)
    conf.num_sample_steps = args.num_sample_steps   # parity: inference.py:148
    conf.ckpt_path = args.ckpt_path                 # parity: inference.py:149
    conf.use_dpmpp_solver = getattr(args, 'use_dpmpp_solver', True)
    conf.compute_dtype = {'fp32': 'float32', 'bf16': 'bfloat16',
                          'int8': 'bfloat16'}[args.precision]
    if args.precision == 'int8':
        conf.quantize = 'w8a8'
        conf.quantize_min_channels = getattr(args, 'quantize_min_channels', 512)
        if getattr(args, 'quantize_smooth_alpha', 0.0):
            conf.quantize_smooth_alpha = args.quantize_smooth_alpha
        if getattr(args, 'quant_cal_mode', 'max') != 'max':
            conf.quantize_cal_mode = args.quant_cal_mode
    else:
        # --precision fp32/bf16 means what it says even when the YAML carries
        # quantize: w8a8 (e.g. the shipped *_tpu_serving.yaml): the CLI flag is
        # the outermost override, so clear config-level quantization.
        conf.quantize = 'none'
    conf.tile_size = args.tile_size
    conf.use_pallas_kernels = getattr(args, 'use_pallas', False)
    # --mesh keeps fused_linattn on: the fused blocks run per-shard under
    # shard_map over the data axis (layers._fused_shard_wrap), with an
    # automatic XLA fallback when the tile batch doesn't divide it
    if getattr(args, 'continuous_sampler', None):
        conf.continuous_sampler = args.continuous_sampler
    if getattr(args, 'ddim_eta', None) is not None:
        conf.ddim_eta = args.ddim_eta
    if getattr(args, 'deep_cache', 0):
        conf.deep_cache_interval = args.deep_cache
        conf.deep_cache_depth = getattr(args, 'deep_cache_depth', 2)
        conf.deep_cache_schedule = getattr(args, 'deep_cache_schedule', '')

    import jax
    if getattr(args, 'matmul_precision', 'default') != 'default':
        jax.config.update('jax_default_matmul_precision', args.matmul_precision)

    from srgd_tpu.factory import get_model
    wrapper, net, params = get_model(conf)

    if args.precision == 'int8' and getattr(args, 'quant_calibrate', False):
        from srgd_tpu.nn.quant import (calibrate_sampler,
                                       calibration_fingerprint,
                                       load_calibration, save_calibration)
        if getattr(args, 'quantize_smooth_alpha', 0.0):
            logger.warning(
                'combining --quant_calibrate with --quantize_smooth_alpha '
                'measured WORSE than either alone, with or without '
                '--quant_calibrate_per_time (static per-tensor scales '
                'compound calibration drift; docs/PERF.md round 6) — '
                'smoothing is intended for dynamic scales')
        per_time = getattr(args, 'quant_calibrate_per_time', False)
        cache = getattr(args, 'quant_calibrate_cache', '')
        fp = calibration_fingerprint(
            conf, ckpt_path=args.ckpt_path, tile_size=args.tile_size,
            per_time=per_time, seed=args.seed, class_label=args.test_label,
            batch=min(args.batch_size, 4))
        loaded = None
        if cache and os.path.exists(cache):
            loaded = load_calibration(cache, params, fp)
        if loaded is not None:
            params = loaded
            logger.info('loaded calibration cache %s (calibrate phase '
                        'skipped)', cache)
        else:
            params = calibrate_sampler(
                wrapper, params, jax.random.PRNGKey(args.seed),
                tile_size=args.tile_size, batch=min(args.batch_size, 4),
                class_label=args.test_label, per_time=per_time)
            if cache and any(k in params for k in ('quant_stats',
                                                   'quant_stats_t')):
                save_calibration(cache, params, fp)
                logger.info('saved calibration cache %s', cache)

    opts = dict(exec_mode=args.exec_mode,
                batch_size=args.batch_size, tile_size=args.tile_size,
                tile_stride=conf.tile_stride or None,  # None = tile_size
                cond_scale=args.cond_scale,
                guidance_start_steps=args.guidance_start_steps,
                class_cond_scale=args.class_cond_scale,
                class_guidance_start_steps=args.class_guidance_start_steps,
                generation_start_steps=args.generation_start_steps,
                num_sample_steps=args.num_sample_steps,
                model=conf.model)
    mesh = None
    if getattr(args, 'mesh', ''):
        from srgd_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(tuple(int(x) for x in args.mesh.split(',')))
    return wrapper, net, params, opts, mesh


def main(argv=None):
    from srgd_tpu.utils.platform import (assert_accelerator_reachable,
                                         enable_compile_cache,
                                         sync_platform_env)
    sync_platform_env()
    assert_accelerator_reachable()
    enable_compile_cache()  # persistent XLA compile cache (SRGD_COMPILE_CACHE)
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(levelname)s %(message)s')
    args = parse_args(argv)
    wrapper, net, params, opts, mesh = build_model_and_opts(args)
    sampler = SamplerCache(wrapper, params, opts, mesh=mesh)

    print(args)
    batch_sr_target_images(args.input_dir, args.output_dir, sampler,
                           scale=4, test_label=args.test_label,
                           start_index=args.start_index, end_index=args.end_index,
                           interpolation=args.interpolation, seed=args.seed)


if __name__ == '__main__':
    main()
