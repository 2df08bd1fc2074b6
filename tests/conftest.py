"""Test configuration: 8 virtual CPU devices + float64 for parity tests.

The ambient environment pre-registers a remote TPU backend (and latches
JAX_PLATFORMS at interpreter startup, before conftest runs), so forcing the
platform must go through jax.config, not os.environ.
"""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
