"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the standard JAX way
to test distributed code without a pod); numerics tests force float32
matmuls so tolerances match the reference's CPU gates (3e-5).

Note: this container's sitecustomize imports jax and registers the remote
'axon' TPU backend before any test code runs, so JAX_PLATFORMS env tweaks
are too late — jax.config.update is the only reliable switch.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
