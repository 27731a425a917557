"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is tested without hardware via XLA's host-platform device
splitting (the JAX-idiomatic fake-backend pattern, SURVEY.md section 4).

Note: this image's sitecustomize registers the axon TPU PJRT plugin and
overrides JAX_PLATFORMS programmatically, so the env var alone is not enough —
we must also update jax.config before any backend is touched.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compilation cache (gitignored): the fast tier's wall time
# is dominated by recompiling the same tiny jitted programs every run on
# this 1-core box — with a warm cache `pytest -m "not slow"` drops from
# ~15 min to well under 10. Keyed by HLO hash, so code changes that alter
# a program recompile exactly that program; `rm -rf .jax_cache` resets.
# Same kill-switch as the TPU entry points (SRGD_COMPILE_CACHE=0 disables,
# =DIR redirects), and the write threshold honors JAX's own env override:
# cache WRITES of CPU executables can segfault after a host migration
# changes the machine features under a populated cache (observed 2026-08-21,
# crash inside put_executable_and_time), in which case
# JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1e9 keeps the warm reads while
# disabling the crashing writes.
_cache_env = os.environ.get('SRGD_COMPILE_CACHE', '')
if _cache_env != '0':
    _cache_dir = _cache_env or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', float(
        os.environ.get('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', 0.4)))

assert len(jax.devices()) == 8, jax.devices()
