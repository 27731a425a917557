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
