"""Test config: run on CPU with an 8-device virtual mesh.

Multi-chip sharding tests use the virtual device mesh (the TPU analog of a
fake backend); bench.py runs on the real chip.

Note: the environment may pin JAX_PLATFORMS=axon (a real-TPU tunnel) via
sitecustomize, so the env var alone is not enough — jax.config.update wins.
XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
