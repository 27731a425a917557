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
