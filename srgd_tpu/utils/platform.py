"""Make the JAX_PLATFORMS env var binding for CLI entry points.

Plain JAX honors ``JAX_PLATFORMS=cpu``, but a deployment's site hook can
re-register an accelerator plugin programmatically and clobber the env var
(this repo's TPU deployment does exactly that — see CLAUDE.md "Environment
gotchas"). Re-asserting the env value through ``jax.config`` at entry-point
time restores the standard JAX contract: a user who sets
``JAX_PLATFORMS=cpu`` gets CPU, on any machine. No-op when the variable is
unset or already in effect.
"""

from __future__ import annotations

import os


def sync_platform_env() -> None:
    plat = os.environ.get('JAX_PLATFORMS', '')
    if not plat:
        return
    import jax
    try:
        jax.config.update('jax_platforms', plat)
    except Exception:
        pass  # unknown platform names surface later with jax's own error


# The deployment's TPU plugin ('axon') reaches the chip through a local
# TCP relay on these loopback ports; when the relay process is gone,
# jax.devices() does NOT error — it retries the dial forever. Probe the
# first relay port directly so entry points can fail fast (seconds) with
# an actionable message instead of hanging a CI/bench window.
_RELAY_PORTS = (8082, 8083, 8087)


def assert_accelerator_reachable(timeout: float = 3.0) -> None:
    """Fail fast when the configured platform is the TPU relay and the
    relay is down. No-op on cpu (or when JAX_PLATFORMS explicitly asks for
    cpu). A listening port doesn't guarantee a healthy tunnel, but a
    refused connect guarantees a dead one — the hang-forever case."""
    import socket

    plat = os.environ.get('JAX_PLATFORMS', '')
    if 'axon' not in plat:
        return  # cpu/unset/other: plain JAX errors out on its own
    last = None
    for port in _RELAY_PORTS:
        try:
            socket.create_connection(('127.0.0.1', port), timeout).close()
            return
        except OSError as e:
            last = e
    raise RuntimeError(
        'TPU relay is unreachable (no listener on 127.0.0.1:%s — %s): '
        'jax.devices() would hang forever. The relay process (host-managed '
        '.tpu_init) is not running; it cannot be restarted from inside '
        'this VM. Run on CPU with JAX_PLATFORMS=cpu, or retry once the '
        'host restores the relay.' % (','.join(map(str, _RELAY_PORTS)),
                                      last))


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a repo-local dir.

    The test suite has used this since round 4 (tests/conftest.py) and it
    cut the fast tier from ~15 to ~5 min; this wires the same lever into
    the TPU entry points (bench/infer/serve/train + the measurement
    probes), where BENCH_r04 showed 313.8 s of compile+first vs 2.9 s of
    measurement. Whether it helps on the 'axon' relay backend depends on
    whether that PJRT client serializes executables — JAX degrades
    gracefully (cache misses, warning once) if not, so this is safe to
    leave on everywhere. Keyed by HLO hash + backend, so CPU and TPU
    entries coexist in one directory and code changes invalidate exactly
    the programs they alter.

    Env: SRGD_COMPILE_CACHE overrides the directory; '0' or 'off'
    disables. Returns the directory in effect (None when disabled).
    """
    env = os.environ.get('SRGD_COMPILE_CACHE', '')
    if env in ('0', 'off'):
        return None
    if env:
        cache_dir = env
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), '.jax_cache')
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        # the flagship programs all take >>1s to compile; the floor only
        # filters out trivial host utility programs. Honoring JAX's own env
        # override matters operationally: cache WRITES of CPU executables
        # can segfault after a host migration changes the machine features
        # (observed 2026-08-21, put_executable_and_time) — setting
        # JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1e9 keeps warm reads
        # while disabling the crashing writes.
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(os.environ.get(
                              'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS',
                              0.4)))
    except Exception:
        return None  # ancient jax without the knobs: run uncached
    return cache_dir
