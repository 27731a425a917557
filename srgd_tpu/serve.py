"""Long-lived production serving daemon for srgd-tpu.

The reference ships only a one-shot batch CLI (/root/reference/inference.py);
real deployments need a resident process. This daemon loads the model once
and keeps everything hot across requests — device-resident (optionally
mesh-replicated) weights and the per-geometry jitted samplers — then serves
through either front-end, or both at once:

- **watch**: continuously polls ``--input_dir`` for new images, writes 4x
  outputs to ``--output_dir`` (same skip-existing/rename semantics as the
  batch CLI, so it is idempotent and resumable);
- **http**: stdlib threaded HTTP server — ``POST /v1/sr`` (image body in,
  PNG out; query knobs ``seed``, ``label``, and since round 9 per-request
  classifier-free guidance ``class_cond_scale`` / ``cond_scale`` — the
  measured recipe is per-class, docs/PERF.md q90; both axes at once is a
  400 per the reference's dual-CFG guard), ``GET /healthz`` (liveness +
  model info, responsive even mid-sample), ``GET /stats`` (counters).

TPU-first serving design:

- **Geometry bucketing** (``--lr_bucket``, default 64): arbitrary input
  sizes would each compile their own sampler. Inputs are reflect-padded up
  to the next bucket multiple before the 4x pre-upscale and the SR output
  is cropped back, so all requests in a bucket share one compiled geometry
  and only the first request of a bucket pays the compile.
- **Warmup** (``--warmup_sizes``): pre-trace the listed LR sizes at startup
  so no user request ever pays first-compile latency.
- **Request coalescing** (``--coalesce_window``): concurrent same-geometry
  seedless requests are stacked into ONE batched canvas, pooling their
  tiles into the tile minibatch — small images alone underfill the chip.
  Explicitly-seeded requests always run alone (per-request determinism).
- One sampler runs at a time (the chip is throughput-bound); HTTP requests
  serialize on a model lock while health stays responsive.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import signal
import threading
import time

import numpy as np

logger = logging.getLogger('srgd_tpu.serve')


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='srgd-tpu serving daemon')
    p.add_argument('-c', '--conf', required=True)
    p.add_argument('-m', '--ckpt_path', type=str, required=True)
    p.add_argument('--mode', type=str, default='watch',
                   choices=['watch', 'http', 'both'])
    # watch front-end
    p.add_argument('--input_dir', type=str, default=None)
    p.add_argument('--output_dir', type=str, default=None)
    p.add_argument('--poll_interval', type=float, default=2.0)
    p.add_argument('--max_failures', type=int, default=3,
                   help='consecutive failures before a watched file is '
                        'quarantined (transient sampler hiccups retry)')
    p.add_argument('--retry_after_polls', type=int, default=30,
                   help='polls after which a quarantined file is retried')
    # http front-end
    p.add_argument('--port', type=int, default=8471)
    p.add_argument('--host', type=str, default='127.0.0.1')
    # serving behavior
    p.add_argument('--lr_bucket', type=int, default=64,
                   help='reflect-pad LR inputs up to a multiple of this many '
                        'pixels so requests share compiled geometries (0 = off)')
    p.add_argument('--coalesce_window', type=float, default=0.0,
                   help='seconds to wait for same-geometry requests and '
                        'sample them as ONE batched canvas (0 = off). Small '
                        'images alone underfill the tile minibatch; batching '
                        'canvases pools their tiles. Coalesced requests '
                        'share one noise stream (per-request seeds still '
                        'run alone, deterministically)')
    p.add_argument('--max_batch_images', type=int, default=8,
                   help='cap on canvases coalesced into one batch')
    p.add_argument('--warmup_sizes', type=str, default='',
                   help="comma-separated square LR sizes to precompile at "
                        "startup, e.g. '64,128'")
    # sampling knobs (same semantics as srgd_tpu.infer)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--num_sample_steps', type=int, default=250)
    p.add_argument('--continuous_sampler', type=str, default=None,
                   choices=[None, 'ancestral', 'ddim', 'dpmpp'],
                   help='override the continuous-family sampler (see '
                        'infer.py; the measured fast profile is ddim with '
                        '--ddim_eta 1.0 --num_sample_steps 25, docs/SERVING.md '
                        'knob 5)')
    p.add_argument('--ddim_eta', type=float, default=None,
                   help="stochasticity of --continuous_sampler ddim "
                        "(0 = deterministic, 1 = ancestral-equivalent)")
    p.add_argument('--tile_size', type=int, default=256)
    p.add_argument('--cond_scale', type=float, default=1.0)
    p.add_argument('--class_cond_scale', type=float, default=1.0)
    p.add_argument('--guidance_start_steps', type=int, default=0)
    p.add_argument('--class_guidance_start_steps', type=int, default=0)
    p.add_argument('--generation_start_steps', type=int, default=0)
    p.add_argument('--test_label', type=int, default=None)
    p.add_argument('--seed', type=int, default=71)
    p.add_argument('--interpolation', type=str, default='bicubic')
    p.add_argument('--exec_mode', type=str, default='host',
                   choices=['host', 'scan'])
    p.add_argument('--precision', type=str, default='bf16',
                   choices=['fp32', 'bf16', 'int8'])
    p.add_argument('--quantize_min_channels', type=int, default=512)
    p.add_argument('--quantize_smooth_alpha', type=float, default=0.0)
    p.add_argument('--quant_calibrate', action='store_true')
    p.add_argument('--quant_calibrate_per_time', action='store_true')
    p.add_argument('--quant_cal_mode', type=str, default='max',
                   help="calibration scale estimator: 'max' or 'p<pct>' "
                        "(see infer.py --quant_cal_mode)")
    p.add_argument('--deep_cache', type=int, default=0,
                   help='>1: DeepCache fast sampling — recompute the U-Net '
                        'deep half every Nth step only (see infer.py)')
    p.add_argument('--deep_cache_depth', type=int, default=2)
    p.add_argument('--deep_cache_schedule', type=str, default='',
                   help="non-uniform refresh segments, e.g. '0.5x3/0.5x1' "
                        "(see infer.py --deep_cache_schedule)")
    p.add_argument('--quant_calibrate_cache', type=str, default='',
                   help='.npz path persisting the calibrated scales across '
                        'daemon restarts (fingerprint-checked; a mismatch '
                        'recalibrates and rewrites)')
    p.add_argument('--mesh', type=str, default='')
    p.add_argument('--stall_timeout_seconds', type=float, default=600.0,
                   help='healthz reports 503 "stalled" once a device sample '
                        'has been in flight this long (a wedged accelerator '
                        'path never returns — this lets a liveness probe '
                        'restart the daemon); 0 disables')
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# Geometry bucketing
# ---------------------------------------------------------------------------

def bucket_pad(image, bucket: int):
    """Reflect-pad a PIL image up to the next multiple of ``bucket`` on each
    side. Returns (padded PIL image, (orig_w, orig_h))."""
    if bucket <= 0:
        return image, image.size
    from PIL import Image
    w, h = image.size
    bw = -(-w // bucket) * bucket
    bh = -(-h // bucket) * bucket
    if (bw, bh) == (w, h):
        return image, (w, h)
    arr = np.asarray(image)
    arr = np.pad(arr, ((0, bh - h), (0, bw - w), (0, 0)), mode='reflect')
    return Image.fromarray(arr), (w, h)


def bucket_crop(sr_image, orig_size, scale: int = 4):
    """Crop a bucketed SR output back to scale * the original size."""
    w, h = orig_size
    if sr_image.size == (w * scale, h * scale):
        return sr_image
    return sr_image.crop((0, 0, w * scale, h * scale))


# ---------------------------------------------------------------------------
# Request coalescing
# ---------------------------------------------------------------------------

class _Request:
    def __init__(self, cond, label):
        self.cond = cond            # (1, H, W, C) float32 in [0, 1]
        self.label = label
        self.done = threading.Event()
        self.result = None
        self.error = None


class BatchingQueue:
    """Coalesce same-geometry requests into one batched tiled sample.

    A single worker thread drains the queue: it takes the oldest request,
    waits up to ``window`` seconds for more requests with the SAME canvas
    shape (bucketing makes collisions common), stacks up to ``max_images``
    of them, and runs ``sample_batch(cond (B,H,W,C), labels (B,)|None)``
    once. Tiles from all canvases pool into the tile minibatch, so small
    images stop underfilling the chip.
    """

    def __init__(self, sample_batch, window: float, max_images: int):
        import queue
        self.sample_batch = sample_batch
        self.window = window
        self.max_images = max_images
        self.q = queue.Queue()
        self.stats = {'batches': 0, 'batched_images': 0}
        self._stash = None          # first non-matching request, next head
        self._drain_lock = threading.Lock()   # submit may drain post-exit
        self.stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def submit(self, cond, label):
        """Blocks until the coalesced batch containing this request ran;
        returns (H, W, C) output or raises the batch's error."""
        if self.stop.is_set():
            raise RuntimeError('server shutting down')
        req = _Request(cond, label)
        self.q.put(req)
        # The worker can exit (and the final drain run) between the stop
        # check above and our put — poll so a request enqueued after the
        # drain still gets failed instead of blocking forever.
        while not req.done.wait(0.5):
            if self.stop.is_set() and not self.thread.is_alive():
                self._fail_pending()
        if req.error is not None:
            raise req.error
        return req.result

    def shutdown(self):
        self.stop.set()
        self.q.put(None)            # wake the worker
        # the worker finishes its in-flight batch, then fails the leftovers
        # (it owns _stash, so only it can drain race-free); samples can take
        # minutes, so wait generously before the backstop drain
        self.thread.join(timeout=600)
        self._fail_pending()

    def _fail_pending(self):
        """Fail every queued request so submitters never hang. Only called
        once the worker thread has exited (shutdown join / submit backstop),
        so _stash is no longer concurrently owned; the lock serializes
        multiple late submitters."""
        import queue
        with self._drain_lock:
            leftovers, self._stash = (
                [] if self._stash is None else [self._stash]), None
            while True:
                try:
                    r = self.q.get_nowait()
                except queue.Empty:
                    break
                if r is not None:
                    leftovers.append(r)
            for r in leftovers:
                r.error = RuntimeError('server shutting down')
                r.done.set()

    def _collect(self, head):
        import queue
        group = [head]
        deadline = time.time() + self.window
        while len(group) < self.max_images:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                req = self.q.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                break
            if (req.cond.shape == head.cond.shape
                    and (req.label is None) == (head.label is None)):
                group.append(req)
            else:   # different geometry/label-kind -> next group's head
                self._stash = req
                break
        return group

    def _worker(self):
        while not self.stop.is_set():
            if self._stash is not None:
                head, self._stash = self._stash, None
            else:
                head = self.q.get()
            if head is None:
                continue
            if self.stop.is_set():
                self._stash = head   # _fail_pending picks it up
                break
            group = self._collect(head)
            try:
                conds = np.concatenate([r.cond for r in group], axis=0)
                labels = (None if group[0].label is None
                          else np.asarray([r.label for r in group], np.int32))
                outs = self.sample_batch(conds, labels)
                for i, r in enumerate(group):
                    r.result = outs[i]
            except Exception as e:
                for r in group:
                    r.error = e
            finally:
                self.stats['batches'] += 1
                self.stats['batched_images'] += len(group)
                for r in group:
                    r.done.set()


# ---------------------------------------------------------------------------
# Server core
# ---------------------------------------------------------------------------

class Server:
    """Warm model + jit caches + counters shared by the front-ends."""

    def __init__(self, args):
        self.args = args
        from srgd_tpu.infer import SamplerCache, build_model_and_opts
        sampler_args = argparse.Namespace(**vars(args))
        sampler_args.use_pallas = False
        sampler_args.matmul_precision = 'default'
        wrapper, net, params, opts, mesh = build_model_and_opts(sampler_args)
        self.sampler = SamplerCache(wrapper, params, opts, mesh=mesh)
        self.lock = threading.Lock()       # one sample in flight at a time
        self.stop = threading.Event()
        self.batcher = None
        if args.coalesce_window > 0:
            self.batcher = BatchingQueue(self._sample_batch,
                                         args.coalesce_window,
                                         args.max_batch_images)
        self.stats = {'served': 0, 'errors': 0, 'mpix': 0.0,
                      'sample_seconds': 0.0, 'started': time.time()}
        self.stats_lock = threading.Lock()   # counters are touched from the
                                             # watch, http, and batch threads
        self._sample_started = None  # wall time of the in-flight device
                                     # sample, for stall detection (a wedged
                                     # accelerator path never returns — the
                                     # inflight gauge is what alerts can see)
        # watch-front-end failure bookkeeping (watch thread only): both maps
        # are pruned to the current pending set every pass, so a long-lived
        # daemon's memory stays bounded by the input backlog.
        self.failed_inputs = {}   # filename -> consecutive failure count
        self.quarantined = {}     # filename -> poll index when quarantined
        self._poll_index = 0
        self.model_info = {
            'model': opts.get('model', ''), 'num_sample_steps':
                args.num_sample_steps, 'precision': args.precision,
            'tile_size': args.tile_size, 'lr_bucket': args.lr_bucket,
        }

    def bump_error(self):
        with self.stats_lock:
            self.stats['errors'] += 1

    def sample_inflight_seconds(self):
        with self.stats_lock:
            started = self._sample_started
        return (time.time() - started) if started else 0.0

    def stats_snapshot(self):
        """Counters for /stats (JSON) and /metrics (Prometheus text)."""
        with self.stats_lock:
            s = dict(self.stats)
        s['sample_inflight_seconds'] = round(self.sample_inflight_seconds(), 3)
        s['uptime_seconds'] = time.time() - s.pop('started')
        s['quarantined'] = len(self.quarantined)
        if self.batcher is not None:
            s.update(self.batcher.stats)
        return s

    # -- one request -------------------------------------------------------
    def _timed_sample(self, conds, labels, seed, guidance=None):
        """All device sampling funnels through here so /stats//metrics can
        report how long the current sample has been in flight."""
        with self.lock:
            with self.stats_lock:
                self._sample_started = time.time()
            try:
                return self.sampler.sample(conds, labels, seed,
                                           guidance=guidance)
            finally:
                with self.stats_lock:
                    self._sample_started = None

    def _sample_batch(self, conds, labels):
        """(B, H, W, C) [0,1] -> (B, 4H, 4W, C); the BatchingQueue worker's
        sampling callback. Coalesced batches share one noise stream keyed on
        the server seed."""
        return self._timed_sample(conds, labels, self.args.seed)

    def super_resolve(self, image, seed=None, test_label=None,
                      cond_scale=None, class_cond_scale=None):
        """PIL image in -> 4x PIL image out (bucketed geometry).

        Requests without an explicit seed may be coalesced with concurrent
        same-geometry requests (--coalesce_window); an explicit seed always
        runs alone so per-request determinism holds (the reference's
        re-seed-per-image contract, inference.py:81).

        cond_scale / class_cond_scale override the daemon-level CFG knobs
        for this request (the measured guidance recipe is PER-CLASS —
        docs/PERF.md q90: class scale 2-3 for realsr labels, 1.0
        elsewhere). A guided request always runs alone: coalescing mixes
        canvases into one program and guidance is a trace-time constant."""
        from PIL import Image
        from srgd_tpu.infer import upscale_bicubic
        label = self.args.test_label if test_label is None else test_label
        guidance = {}
        if cond_scale is not None:
            guidance['cond_scale'] = float(cond_scale)
        if class_cond_scale is not None:
            guidance['class_cond_scale'] = float(class_cond_scale)
        eff_cond = guidance.get('cond_scale', self.args.cond_scale)
        eff_class = guidance.get('class_cond_scale',
                                 self.args.class_cond_scale)
        if eff_cond != 1.0 and eff_class != 1.0:
            # same contract as the reference (model.py:3138-3139) and the
            # wrapper guard, surfaced before any device work
            raise ValueError('guidance on both axes is unsupported: pick '
                             'cond_scale or class_cond_scale, not both')
        padded, orig = bucket_pad(image, self.args.lr_bucket)
        upscaled = upscale_bicubic(padded, 4, self.args.interpolation)
        cond = np.asarray(upscaled, dtype=np.float32)[None] / 255.0

        t0 = time.time()
        if self.batcher is not None and seed is None and not guidance:
            out = self.batcher.submit(cond, label)
        else:
            out = self._timed_sample(
                cond, label, self.args.seed if seed is None else seed,
                guidance=guidance or None)[0]
        dt = time.time() - t0

        arr = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
        sr = bucket_crop(Image.fromarray(arr), orig)
        assert sr.size == (orig[0] * 4, orig[1] * 4)
        with self.stats_lock:
            self.stats['served'] += 1
            self.stats['mpix'] += sr.size[0] * sr.size[1] / 1e6
            self.stats['sample_seconds'] += dt
        return sr

    def warmup(self):
        sizes = [int(s) for s in self.args.warmup_sizes.split(',') if s]
        before = dict(self.stats)
        for s in sizes:
            from PIL import Image
            logger.info('warmup: compiling %dpx geometry', s)
            img = Image.fromarray(
                np.zeros((s, s, 3), np.uint8))
            self.super_resolve(img, seed=0)
        # warmups (compile-dominated) are not traffic: restore every counter
        with self.stats_lock:
            self.stats.update(before)

    # -- watch front-end ---------------------------------------------------
    def _record_failure(self, filename):
        n = self.failed_inputs.get(filename, 0) + 1
        self.failed_inputs[filename] = n
        if n >= max(self.args.max_failures, 1):
            self.quarantined[filename] = self._poll_index
            logger.warning('%s failed %d consecutive times; quarantined, '
                           'retry in %d polls', filename, n,
                           self.args.retry_after_polls)

    def process_dir_once(self):
        """One pass over input_dir; returns the number of images produced.

        Same rename/skip/unreadable semantics as the batch CLI (shared
        pending_outputs helper). ALL pending files of a pass are grouped by
        bucketed geometry (stable sorted order within a group), so an
        alphabetically interleaved folder of two geometries samples as two
        batched canvases, not 2N singles. Failures (including unreadable
        inputs, which may be mid-upload) are counted per file: quarantine
        starts only after --max_failures consecutive failures, quarantined
        files are retried every --retry_after_polls polls, and both maps are
        pruned to the pending set — one transient sampler hiccup never
        permanently skips good inputs."""
        from srgd_tpu.infer import pending_outputs, try_open_image
        a = self.args
        os.makedirs(a.output_dir, exist_ok=True)
        self._poll_index += 1
        done = 0

        pending = list(pending_outputs(a.input_dir, a.output_dir))
        live = {fn for fn, _ in pending}
        self.failed_inputs = {f: c for f, c in self.failed_inputs.items()
                              if f in live}
        self.quarantined = {f: p for f, p in self.quarantined.items()
                            if f in live}

        groups = {}     # bucketed geometry -> [(filename, save_path, image)]
        for filename, save_path in pending:
            if self.stop.is_set():
                break
            if filename in self.quarantined:
                if (self._poll_index - self.quarantined[filename]
                        < max(a.retry_after_polls, 1)):
                    continue
                del self.quarantined[filename]   # retry window reached
            image = try_open_image(filename)
            if image is None:
                logger.warning('unreadable input skipped: %s', filename)
                self._record_failure(filename)
                continue
            key = bucket_pad(image, a.lr_bucket)[0].size
            groups.setdefault(key, []).append((filename, save_path, image))

        cap = max(a.max_batch_images, 1)
        for items in groups.values():
            for i in range(0, len(items), cap):
                if self.stop.is_set():
                    break
                batch = items[i:i + cap]
                t0 = time.time()
                try:
                    srs = self._batched_super_resolve([b[2] for b in batch])
                except Exception:
                    self.bump_error()
                    for fn, _sp, _img in batch:
                        self._record_failure(fn)
                    logger.exception('failed batch of %d: %s',
                                     len(batch), [b[0] for b in batch])
                    continue
                dt = time.time() - t0
                with self.stats_lock:
                    self.stats['watch_batches'] = \
                        self.stats.get('watch_batches', 0) + 1
                for (fn, sp, _img), sr in zip(batch, srs):
                    sr.save(sp)
                    self.failed_inputs.pop(fn, None)
                    done += 1
                    logger.info('%s -> %s (batch of %d, %.2fs)', fn, sp,
                                len(batch), dt)
        return done

    def _batched_super_resolve(self, images):
        """Same-bucketed-geometry PIL images -> list of 4x PIL images via
        ONE batched tiled sample."""
        from PIL import Image
        from srgd_tpu.infer import upscale_bicubic
        padded, origs = zip(*(bucket_pad(im, self.args.lr_bucket)
                              for im in images))
        conds = np.stack([
            np.asarray(upscale_bicubic(p, 4, self.args.interpolation),
                       np.float32) / 255.0 for p in padded])
        label = self.args.test_label
        labels = None if label is None else np.full(
            (len(images),), label, np.int32)
        t0 = time.time()
        outs = self._sample_batch(conds, labels)
        dt = time.time() - t0
        srs = []
        for out, orig in zip(outs, origs):
            arr = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
            srs.append(bucket_crop(Image.fromarray(arr), orig))
        with self.stats_lock:
            self.stats['served'] += len(images)
            self.stats['mpix'] += sum(s.size[0] * s.size[1]
                                      for s in srs) / 1e6
            self.stats['sample_seconds'] += dt
        return srs

    def watch_loop(self):
        logger.info('watching %s -> %s every %.1fs', self.args.input_dir,
                    self.args.output_dir, self.args.poll_interval)
        while not self.stop.is_set():
            try:
                self.process_dir_once()
            except Exception:
                self.bump_error()
                logger.exception('watch pass failed')
            self.stop.wait(self.args.poll_interval)

    # -- http front-end ----------------------------------------------------
    def make_http_server(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qs, urlparse
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *a):
                logger.debug('http: ' + fmt, *a)

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == '/healthz':
                    inflight = server.sample_inflight_seconds()
                    stall = server.args.stall_timeout_seconds
                    if stall and inflight > stall:
                        # wedged device path: fail liveness so an
                        # orchestrator restarts the daemon
                        self._json(503, {
                            'status': 'stalled',
                            'sample_inflight_seconds': round(inflight, 3),
                            **server.model_info})
                    else:
                        self._json(200, {'status': 'ok',
                                         'busy': server.lock.locked(),
                                         **server.model_info})
                elif path == '/stats':
                    self._json(200, server.stats_snapshot())
                elif path == '/metrics':
                    # Prometheus text exposition of the same counters
                    lines = []
                    for k, v in sorted(server.stats_snapshot().items()):
                        if isinstance(v, bool) or not isinstance(v, (int, float)):
                            continue
                        kind = ('gauge' if k in ('uptime_seconds',
                                                 'quarantined', 'busy',
                                                 'sample_inflight_seconds')
                                else 'counter')
                        lines.append(f'# TYPE srgd_{k} {kind}')
                        lines.append(f'srgd_{k} {float(v):g}')
                    lines.append('# TYPE srgd_busy gauge')
                    lines.append(f'srgd_busy {int(server.lock.locked())}')
                    body = ('\n'.join(lines) + '\n').encode()
                    self.send_response(200)
                    self.send_header('Content-Type',
                                     'text/plain; version=0.0.4')
                    self.send_header('Content-Length', str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(404, {'error': 'not found'})

            def do_POST(self):
                path = urlparse(self.path)
                if path.path != '/v1/sr':
                    self._json(404, {'error': 'not found'})
                    return
                q = parse_qs(path.query)
                try:
                    from PIL import Image
                    n = int(self.headers.get('Content-Length', 0))
                    img = Image.open(io.BytesIO(self.rfile.read(n)))
                    img = img.convert('RGB')
                except Exception as e:
                    server.bump_error()
                    self._json(400, {'error': f'bad image: {e}'})
                    return
                try:
                    seed = int(q['seed'][0]) if 'seed' in q else None
                    label = (int(q['label'][0]) if 'label' in q else None)
                    cs = (float(q['cond_scale'][0])
                          if 'cond_scale' in q else None)
                    ccs = (float(q['class_cond_scale'][0])
                          if 'class_cond_scale' in q else None)
                except ValueError as e:
                    server.bump_error()
                    self._json(400, {'error': f'bad query param: {e}'})
                    return
                try:
                    sr = server.super_resolve(img, seed=seed, test_label=label,
                                              cond_scale=cs,
                                              class_cond_scale=ccs)
                except ValueError as e:
                    # request contract violation (e.g. guidance on both
                    # axes — reference parity guard), not a server fault
                    server.bump_error()
                    self._json(400, {'error': str(e)})
                    return
                try:
                    buf = io.BytesIO()
                    sr.save(buf, format='PNG')
                    body = buf.getvalue()
                    self.send_response(200)
                    self.send_header('Content-Type', 'image/png')
                    self.send_header('Content-Length', str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:
                    server.bump_error()
                    logger.exception('sr request failed')
                    self._json(500, {'error': str(e)})

        return ThreadingHTTPServer((self.args.host, self.args.port), Handler)


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
    if args.mode in ('watch', 'both') and not (args.input_dir and args.output_dir):
        raise SystemExit('--mode watch requires --input_dir and --output_dir')

    server = Server(args)
    if args.warmup_sizes:
        server.warmup()

    def handle_term(signum, frame):
        logger.info('signal %d: shutting down', signum)
        server.stop.set()

    signal.signal(signal.SIGTERM, handle_term)
    signal.signal(signal.SIGINT, handle_term)

    httpd = None
    if args.mode in ('http', 'both'):
        httpd = server.make_http_server()
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        logger.info('http serving on %s:%d', args.host, args.port)

    if args.mode in ('watch', 'both'):
        server.watch_loop()
    else:
        server.stop.wait()

    if httpd is not None:
        httpd.shutdown()
    if server.batcher is not None:
        server.batcher.shutdown()
    logger.info('served %d images, %d errors', server.stats['served'],
                server.stats['errors'])


if __name__ == '__main__':
    main()
