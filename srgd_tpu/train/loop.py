"""Full training driver: data -> sharded train steps -> EMA -> checkpoints.

The reference never released its trainer; this implements the training
capability its config describes (epochs/warmup/cosine/EMA/save_every_epoch/
best-loss checkpointing, SURVEY.md sections 3.4 and 5.4), TPU-native:
data-parallel batches over the mesh, jitted step, orbax checkpoints of
{params, ema, opt_state, step}.

CLI: python -m srgd_tpu.train.loop -c conf.yaml --data_dir D --out_dir D
     [--steps N --log_every N --mesh 4,2]
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys
import time
from contextlib import closing as _closing

import numpy as np

from srgd_tpu.utils.profiling import PhaseTimer

logger = logging.getLogger('srgd_tpu.train')


class _GracefulStop:
    """Stop the training loop cleanly on SIGTERM/SIGINT.

    Chip time on this box comes in bounded stints (`timeout N python -m
    srgd_tpu.train.loop ...` sends SIGTERM); without a handler every stint
    forfeits the steps since the last periodic save. The first signal sets
    ``triggered`` so the loop finishes its in-flight step and saves a final
    checkpoint; a second signal falls through to the previous disposition
    (hard kill). Previous handlers are restored on exit, and installation is
    skipped off the main thread (tests drive _train_inner directly)."""

    def __init__(self):
        self._signals = []
        self._prev = {}

    def _request(self, signum, frame):
        self._signals.append(signum)
        signal.signal(signum, self._prev[signum])

    @property
    def triggered(self) -> bool:
        return bool(self._signals)

    def __enter__(self):
        try:
            for s in (signal.SIGTERM, signal.SIGINT):
                self._prev[s] = signal.signal(s, self._request)
        except ValueError:  # not the main thread; run unguarded
            # restore any handler installed before the failing call so a
            # partial install never leaves _request live with an empty _prev
            for s, h in self._prev.items():
                signal.signal(s, h)
            self._prev = {}
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            # the handler swaps itself out on first delivery; only restore
            # what is still ours
            if signal.getsignal(s) == self._request:
                signal.signal(s, h)
        return False


class _DevicePrefetcher:
    """Pipelines batch production + host->device transfer with the step.

    The remote-relay transfer runs at ~25-30 MB/s, so the inline
    device_put of a 256px batch used to cost more wall time than the train
    step itself (583 ms data vs 118 ms step measured on the evidence
    retrain). A single worker thread pulls from the host iterator and
    device_puts ``depth`` batches ahead; the transfer is network IO so it
    genuinely overlaps device compute even on this 1-core box."""

    def __init__(self, it, sharding, depth: int = 2):
        import queue
        import threading

        import jax
        import jax.numpy as jnp
        self._q: 'queue.Queue' = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc = None

        def run():
            try:
                for batch in it:
                    out = tuple(jax.device_put(jnp.asarray(a), sharding)
                                for a in batch)
                    while not self._stop.is_set():
                        try:
                            self._q.put(out, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer
                self._exc = e
                self._q.put(None)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None and self._exc is not None:
            raise self._exc
        return item

    def close(self):
        self._stop.set()


def _conf_scale(conf) -> int:
    """SR factor from the config's image-size pair (config.py:80-83): the
    degradation pipeline downsamples HR crops by hr_image_size /
    lr_image_size (4 for the shipped 256/64 flagship)."""
    if conf.lr_image_size <= 0 or conf.hr_image_size % conf.lr_image_size:
        raise ValueError(
            f'hr_image_size {conf.hr_image_size} must be an integer multiple '
            f'of lr_image_size {conf.lr_image_size}')
    return conf.hr_image_size // conf.lr_image_size


def validate(conf, wrapper, params, val_dir: str, rng, num_images: int = 4,
             lpips_params=None, sample_dir: str = None, step: int = 0,
             fold_role=None):
    """Sample with the current (EMA) params on degraded val crops and score
    PSNR/SSIM (+ LPIPS when weights are provided) — the metric surface the
    reference's config names (test_target, config.py:181) but never shipped.

    Honors valid_preprocess / valid_trans_mode (config.py:147, 152) and the
    save_validation_sample / save_validation_hr_sample switches
    (config.py:176-177) when sample_dir is given; skip_sample (config.py:69)
    suppresses the sample PNGs while keeping the metrics. fold_role='val'
    restricts val_dir to the held-out folds (n_fold/train_fold,
    validation_ratio)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srgd_tpu.train.data import DegradationDataset, DegradeConfig
    from srgd_tpu.utils.metrics import psnr, ssim

    conditional = 'conditional' in conf.model
    val_cfg = DegradeConfig.from_conf(conf)
    val_cfg.trans_mode = conf.valid_trans_mode
    val_cfg.__post_init__()  # re-validate the overridden mode
    ds = DegradationDataset(val_dir, crop_size=conf.hr_image_size,
                            batch_size=num_images, num_workers=1,
                            seed=conf.seed + 1,
                            num_classes=conf.num_classes,
                            degrade_cfg=val_cfg,
                            preprocess=conf.valid_preprocess,
                            scale_size=conf.scale_size,
                            scale=_conf_scale(conf),
                            crop_size_limit=conf.crop_size_limit,
                            n_fold=conf.n_fold, fold=conf.train_fold,
                            fold_role=fold_role,
                            validation_ratio=conf.validation_ratio,
                            hflip=False, rotate=False)
    hr, cond, label = next(iter(ds))
    hr, cond = jnp.asarray(hr), jnp.asarray(cond)
    out = wrapper.sample(params, rng, cond,
                         jnp.asarray(label) if conditional else None,
                         num_sample_steps=conf.val_num_sample_steps)
    metrics = {'psnr': float(psnr(out, hr)), 'ssim': float(ssim(out, hr))}
    if lpips_params is not None:
        from srgd_tpu.utils.lpips import lpips
        metrics['lpips'] = float(jnp.mean(lpips(out, hr, lpips_params)))

    if sample_dir and not conf.skip_sample and (
            conf.save_validation_sample or conf.save_validation_hr_sample):
        from PIL import Image
        os.makedirs(sample_dir, exist_ok=True)

        def save(arr, name):
            png = (np.clip(np.asarray(arr), 0, 1) * 255).astype(np.uint8)
            for i, im in enumerate(png):
                Image.fromarray(im).save(
                    os.path.join(sample_dir, f'{name}_{step:06d}_{i}.png'))

        if conf.save_validation_sample:
            save(out, 'sample')
        if conf.save_validation_hr_sample:
            save(hr, 'hr')
    return metrics


def _load_lpips_or_raise(conf):
    """test_target: best_lpips needs converted VGG16+LPIPS weights — the
    pretrained nets cannot be fetched in this environment (utils/lpips.py)."""
    if not conf.lpips_weights_path:
        raise NotImplementedError(
            "test_target: best_lpips requires conf.lpips_weights_path (a "
            ".npz produced by srgd_tpu.utils.lpips.convert_torch_lpips from "
            "the official torchvision VGG16 + lpips linear weights); LPIPS "
            "is otherwise unsupported because pretrained weights cannot be "
            "downloaded here.")
    from srgd_tpu.utils.lpips import load_lpips_params
    return load_lpips_params(conf.lpips_weights_path)


def train(conf, data_dir: str, out_dir: str, total_steps: int = 1000,
          log_every: int = 50, save_every: int = 500, mesh_shape=None,
          resume: bool = True, val_dir: str = None):
    conditional = 'conditional' in conf.model
    if conf.log_dir:
        # reference config.py:187 — its (unreleased) trainer logs under
        # log_dir; mirror that with a plain-text run log alongside stdout.
        # A relative log_dir lands inside out_dir so runs stay self-contained.
        ldir = (conf.log_dir if os.path.isabs(conf.log_dir)
                else os.path.join(out_dir, conf.log_dir))
        os.makedirs(ldir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(ldir, 'train.log'))
        fh.setFormatter(logging.Formatter('%(asctime)s %(name)s %(message)s'))
        logger.addHandler(fh)
        if logger.getEffectiveLevel() > logging.INFO:
            logger.setLevel(logging.INFO)  # progress lines reach the file
                                           # even without basicConfig (library
                                           # use; the CLI sets INFO anyway)
        try:
            return _train_inner(conf, data_dir, out_dir, total_steps,
                                log_every, save_every, mesh_shape, resume,
                                val_dir, conditional)
        finally:
            logger.removeHandler(fh)
            fh.close()
    return _train_inner(conf, data_dir, out_dir, total_steps, log_every,
                        save_every, mesh_shape, resume, val_dir, conditional)


def _train_inner(conf, data_dir, out_dir, total_steps, log_every, save_every,
                 mesh_shape, resume, val_dir, conditional):
    import jax
    import jax.numpy as jnp

    from srgd_tpu.checkpoint.io import (
        checkpoint_exists, restore_params, save_params)
    from srgd_tpu.factory import build_unet_from_config, build_wrapper
    from srgd_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from srgd_tpu.train.data import DegradationDataset
    from srgd_tpu.train.trainer import (
        TrainState, create_train_state, make_optimizer, make_train_step)
    if conf.quantize != 'none':
        # QuantConv rounds with no straight-through estimator, so training a
        # quantized net gets ~zero conv gradients and silently fails to learn.
        # Serving YAMLs carry the full training key surface — reject rather
        # than ignore (same pattern as plateau_mode/test_target rejects).
        raise ValueError(
            f"quantize: {conf.quantize!r} is inference-only (no STE through "
            "the int8 rounding); train with quantize: 'none' and enable int8 "
            "at serving time via --precision int8.")
    if conditional and conf.conditional_task_type != 'realsr_denoise_sr':
        # the only task recipe the reference defines (config.py:20-21): the
        # 3-class realsr/denoise/sr degradation conditioning
        raise ValueError(
            f'conditional_task_type {conf.conditional_task_type!r} is not '
            "supported; the only defined task is 'realsr_denoise_sr'")
    if conf.val_realsrv3 or conf.val_drealsr:
        # external benchmark val sets (config.py:73-76) cannot be fetched in
        # this environment — requesting them is a named error, not a no-op
        raise NotImplementedError(
            'val_realsrv3/val_drealsr require the RealSR-V3/DRealSR '
            'benchmark datasets, which cannot be downloaded here; place a '
            'local copy and point --val_dir at it instead')
    # the fused whole-block kernels are differentiable since round 3 via
    # custom VJPs (kernels/{linattn,attn}_block.py: Pallas forward, XLA-
    # formulation backward — a remat-style recompute that matches the
    # remat_unet recipe), so training keeps conf.fused_linattn as configured
    if conf.amp and conf.compute_dtype == 'float32':
        # the reference trainer autocasts under amp/amp_dtype; the TPU
        # analog is bfloat16 compute over f32 master params (no loss
        # scaling needed, unlike fp16). An explicit compute_dtype wins.
        conf.compute_dtype = 'bfloat16'
        logger.info("amp: true -> bfloat16 compute, float32 master params")
    net = build_unet_from_config(conf)
    wrapper = build_wrapper(conf, net)

    if conf.print_freq:          # reference config.py:188
        log_every = conf.print_freq

    # checkpoint-selection policy (reference config.py:181)
    target = conf.test_target
    if target not in ('best_loss', 'best_psnr', 'best_ssim', 'best_lpips'):
        raise ValueError(f'unknown test_target {target!r}')
    lpips_params = _load_lpips_or_raise(conf) if target == 'best_lpips' else None

    from srgd_tpu.train.data import DegradeConfig
    ds = DegradationDataset(
        data_dir, crop_size=conf.hr_image_size, batch_size=conf.batch_size,
        num_classes=conf.num_classes, hflip=conf.hflip, rotate=conf.rotate,
        seed=conf.seed, num_workers=conf.num_workers,
        degrade_cfg=DegradeConfig.from_conf(conf),
        preprocess=conf.train_preprocess, scale_size=conf.scale_size,
        scale=_conf_scale(conf), crop_rate=conf.crop_rate,
        crop_size_limit=conf.crop_size_limit,
        n_fold=conf.n_fold, fold=conf.train_fold, fold_role='train',
        shuffle=conf.shuffle, as_uint8=True)

    rng = jax.random.PRNGKey(conf.seed)
    kwargs = {'class_label': jnp.zeros((1,), jnp.int32)} if conditional else {}
    s = conf.hr_image_size
    params = net.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1,)),
                      cond=jnp.zeros((1, s, s, 3)), **kwargs)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info('model %s: %.1fM params', conf.model, n_params / 1e6)

    if mesh_shape:
        mesh = make_mesh(mesh_shape)
    else:
        # data axis must divide the global batch
        import math as _math
        n_dev = len(jax.devices())
        dp = _math.gcd(conf.batch_size, n_dev)
        mesh = make_mesh((dp, 1), devices=jax.devices()[:dp])
    params = shard_params(params, mesh)
    steps_per_epoch = max(total_steps // max(conf.epochs, 1), 1)
    optimizer = make_optimizer(conf, steps_per_epoch=steps_per_epoch)
    state = create_train_state(params, optimizer)
    if conf.save_every_epoch:  # checkpoint policy knob (config.py:179)
        save_every = steps_per_epoch

    # checkpoint naming from config (reference artifact layout:
    # {model_dir}/{save_dir}/{prefix}_... , config.py:7-8, 186)
    ckpt_dir = os.path.join(out_dir, conf.prefix or 'ckpt')
    best_score = -float(np.inf)
    if resume and checkpoint_exists(ckpt_dir):
        raw = restore_params(ckpt_dir)
        if 'opt_state' in raw:
            # re-restore against a template so optax state (namedtuples,
            # EmptyState, ...) comes back with its real structure, not dicts
            restored = restore_params(ckpt_dir, template={
                'params': state.params, 'ema_params': state.ema_params,
                'opt_state': state.opt_state, 'step': 0,
                'best_score': 0.0})
            opt_state = restored['opt_state']
            best_score = float(restored.get('best_score', -np.inf))
        else:  # legacy checkpoint without optimizer state
            logger.warning('checkpoint has no opt_state; Adam moments reset')
            restored, opt_state = raw, state.opt_state
        state = TrainState(params=restored['params'],
                           opt_state=opt_state,
                           ema_params=restored['ema_params'],
                           step=jnp.asarray(restored['step'], jnp.int32))
        logger.info('resumed from %s at step %d', ckpt_dir, int(state.step))

    step_fn = jax.jit(make_train_step(wrapper, optimizer, conf.ema_decay,
                                      conditional))
    bs = batch_sharding(mesh)

    def save_state(path, step):
        save_params(path, {
            'params': jax.device_get(state.params),
            'ema_params': jax.device_get(state.ema_params),
            'opt_state': jax.device_get(state.opt_state),
            'step': step, 'best_score': best_score})

    os.makedirs(out_dir, exist_ok=True)
    losses = []
    # resume-aware: milestones at or before the restored step are presumed
    # already snapshotted by the stint that crossed them
    milestone = int(os.environ.get('TRAIN_MILESTONE_EVERY', 20000))
    last_milestone = int(state.step) // milestone if milestone > 0 else 0
    timer = PhaseTimer()
    t0 = time.time()
    it = _DevicePrefetcher(iter(ds), bs)
    with _GracefulStop() as stop, mesh, _closing(it):
        while not stop.triggered and int(state.step) < total_steps:
            with timer.phase('data'):
                hr, cond, label = next(it)
            with timer.phase('step'):
                state, loss = step_fn(state, rng, hr, cond,
                                      label if conditional else None)
                losses.append(float(loss))  # syncs the step
            step = int(state.step)
            if step % log_every == 0:
                dt = time.time() - t0
                logger.info('step %d loss %.4f (%.2f steps/s)',
                            step, float(np.mean(losses[-log_every:])),
                            log_every / max(dt, 1e-9))
                t0 = time.time()
            if step % save_every == 0 or step >= total_steps:
                # score per conf.test_target (higher = better; loss/lpips
                # negated); best_loss needs no validation pass. Scored
                # BEFORE the periodic save so the saved best_score is
                # current, and the best-snapshot becomes a cheap file copy
                # of the checkpoint just written (no second device_get).
                score = None
                # without an explicit val_dir, validation falls back to the
                # held-out folds of the training dir (n_fold/train_fold)
                vdir, vrole = ((val_dir, None) if val_dir else
                               (data_dir, 'val') if conf.n_fold > 1 else
                               (None, None))
                if target == 'best_loss':
                    score = -float(np.mean(losses[-log_every:]))
                elif vdir and not conf.skip_val:
                    with timer.phase('val'):
                        m = validate(conf, wrapper, state.ema_params, vdir,
                                     jax.random.fold_in(rng, step),
                                     num_images=conf.sample_size,
                                     lpips_params=lpips_params,
                                     sample_dir=os.path.join(out_dir,
                                                             'val_samples'),
                                     step=step, fold_role=vrole)
                    logger.info('val @%d: %s', step,
                                '  '.join(f'{k} {v:.4f}' for k, v in m.items()))
                    score = {'best_psnr': m['psnr'], 'best_ssim': m['ssim'],
                             'best_lpips': -m.get('lpips', np.inf)}[target]
                improved = score is not None and score > best_score
                if improved:
                    best_score = score
                with timer.phase('save'):
                    save_state(ckpt_dir, step)
                logger.info('saved checkpoint at step %d -> %s', step, ckpt_dir)
                if improved:
                    from srgd_tpu.checkpoint.io import copy_checkpoint
                    with timer.phase('save_best'):
                        copy_checkpoint(ckpt_dir, os.path.join(
                            out_dir, f'{conf.prefix or "ckpt"}_{target}'))
                # milestone snapshots: keep an immutable copy every
                # TRAIN_MILESTONE_EVERY steps (default 20k) so later runs
                # can be compared at EQUAL step counts — the training-draw
                # variance at 20k steps (~2-4 dB run to run, docs/PERF.md)
                # is unquantifiable when the rolling checkpoint is the only
                # surviving artifact. Cheap: a file copy of the checkpoint
                # just written. Snapshots on BOUNDARY CROSSING, not exact
                # coincidence (ADVICE r4): when save_every does not divide
                # the milestone (e.g. save_every_epoch), the first save at
                # or past each multiple takes the snapshot, named by its
                # actual step so an off-boundary copy can't masquerade as
                # an exact one.
                if milestone > 0 and step // milestone > last_milestone:
                    last_milestone = step // milestone
                    from srgd_tpu.checkpoint.io import copy_checkpoint
                    with timer.phase('save_milestone'):
                        copy_checkpoint(ckpt_dir, f'{ckpt_dir}_step{step}')
                    logger.info('milestone snapshot -> %s_step%d',
                                ckpt_dir, step)
    step = int(state.step)
    if stop.triggered and step % save_every != 0 and step < total_steps:
        # signal arrived between periodic saves: persist the stint's tail
        # so the next run resumes from here instead of the last save_every
        save_state(ckpt_dir, step)
        logger.info('stop requested (signal %s): saved checkpoint at step '
                    '%d -> %s', stop._signals, step, ckpt_dir)
    logger.info('phase breakdown:\n%s', timer.report())
    return state


def main(argv=None):
    from srgd_tpu.utils.platform import (assert_accelerator_reachable,
                                         enable_compile_cache,
                                         sync_platform_env)
    sync_platform_env()
    assert_accelerator_reachable()
    enable_compile_cache()  # persistent XLA compile cache (SRGD_COMPILE_CACHE)
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')
    p = argparse.ArgumentParser()
    p.add_argument('-c', '--conf', required=True)
    p.add_argument('--data_dir', default='',
                   help='default: {conf.base_dir}/{conf.dataset_name} '
                        '(the reference dataset layout, config.py:10-11)')
    p.add_argument('--out_dir', default='',
                   help='default: {conf.model_dir}/{conf.save_dir} '
                        '(the reference artifact layout)')
    p.add_argument('--steps', type=int, default=1000)
    p.add_argument('--log_every', type=int, default=50)
    p.add_argument('--save_every', type=int, default=500)
    p.add_argument('--mesh', type=str, default='')
    p.add_argument('--val_dir', type=str, default='')
    args = p.parse_args(argv)

    from srgd_tpu.config import load_config
    conf = load_config(args.conf)
    out_dir = args.out_dir or os.path.join(conf.model_dir, conf.save_dir)
    data_dir = args.data_dir or os.path.join(conf.base_dir, conf.dataset_name)
    mesh_shape = tuple(int(x) for x in args.mesh.split(',')) if args.mesh else None
    state = train(conf, data_dir, out_dir, total_steps=args.steps,
                  log_every=args.log_every, save_every=args.save_every,
                  mesh_shape=mesh_shape, val_dir=args.val_dir or None)
    if int(state.step) < args.steps:
        # graceful SIGTERM/SIGINT stop: the checkpoint is saved but the run
        # is INCOMPLETE — exit nonzero so `set -e` wrappers (e.g.
        # tools/evidence_retrain.sh's .train_done marker) never mistake a
        # killed stint for a finished run
        logger.info('stopped early at step %d/%d; exiting 75 (incomplete)',
                    int(state.step), args.steps)
        sys.exit(75)


if __name__ == '__main__':
    main()
