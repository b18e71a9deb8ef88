"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on host-platform virtual devices exactly as SURVEY.md section 4
prescribes.

Note: this image pre-imports parts of jax at interpreter startup with
JAX_PLATFORMS=axon (tunneled TPU) already read from the environment, so env
mutation here is too late -- the platform must be forced through
`jax.config.update` before any backend is touched.
"""
import os

# must precede first backend initialization
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8'
                           ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent XLA compilation cache: recompiles across test runs are the
# dominant cost on the single-core CI host
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
