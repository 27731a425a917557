"""JAX_PLATFORMS env honoring (utils/platform.py).

This deployment's TPU site hook re-registers the accelerator plugin
programmatically, which clobbers the standard ``JAX_PLATFORMS=cpu``
escape hatch (CLAUDE.md gotcha). Every CLI entry point calls
``sync_platform_env()`` so the plain-JAX contract holds: env var set ->
that platform is used. Must run in a subprocess — the in-process test
session already initialized its backend.
"""

import os
import subprocess
import sys


def test_jax_platforms_env_is_binding():
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "from srgd_tpu.utils.platform import sync_platform_env\n"
        "sync_platform_env()\n"
        "import jax\n"
        "devs = jax.devices()\n"
        "assert devs and all(d.platform == 'cpu' for d in devs), devs\n"
        "print('CPU-OK')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run([sys.executable, '-c', code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'CPU-OK' in out.stdout


def test_sync_platform_env_noop_when_unset():
    from srgd_tpu.utils.platform import sync_platform_env
    saved = os.environ.pop('JAX_PLATFORMS', None)
    try:
        sync_platform_env()   # must not touch jax.config at all
    finally:
        if saved is not None:
            os.environ['JAX_PLATFORMS'] = saved


def test_reachability_noop_off_axon(monkeypatch):
    """cpu / unset / other platforms: never probe, never raise."""
    from srgd_tpu.utils.platform import assert_accelerator_reachable
    for val in ('cpu', '', 'tpu,cpu'):
        if val:
            monkeypatch.setenv('JAX_PLATFORMS', val)
        else:
            monkeypatch.delenv('JAX_PLATFORMS', raising=False)
        assert_accelerator_reachable(timeout=0.1)


def test_reachability_fails_fast_on_dead_relay(monkeypatch):
    """With the axon platform configured and no relay listener, the entry
    points must error in seconds (jax.devices() would hang forever)."""
    import socket
    import time

    import pytest

    import srgd_tpu.utils.platform as plat
    monkeypatch.setenv('JAX_PLATFORMS', 'axon')
    # claim ports nothing listens on (bind-without-listen reserves them,
    # connects get refused) so the test is hermetic even if a real relay
    # is alive on this box
    socks = []
    ports = []
    for _ in plat._RELAY_PORTS:
        s = socket.socket()
        s.bind(('127.0.0.1', 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    monkeypatch.setattr(plat, '_RELAY_PORTS', tuple(ports))
    try:
        t0 = time.time()
        with pytest.raises(RuntimeError, match='relay is unreachable'):
            plat.assert_accelerator_reachable(timeout=1.0)
        assert time.time() - t0 < 10
    finally:
        for s in socks:
            s.close()


def test_reachability_passes_with_listener(monkeypatch):
    import socket

    import srgd_tpu.utils.platform as plat
    monkeypatch.setenv('JAX_PLATFORMS', 'axon')
    srv = socket.socket()
    srv.bind(('127.0.0.1', 0))
    srv.listen(1)
    monkeypatch.setattr(plat, '_RELAY_PORTS',
                        (srv.getsockname()[1],))
    try:
        plat.assert_accelerator_reachable(timeout=1.0)
    finally:
        srv.close()
