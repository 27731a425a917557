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
