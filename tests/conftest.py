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

assert len(jax.devices()) == 8, jax.devices()
