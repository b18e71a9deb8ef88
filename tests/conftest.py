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
# NO persistent compilation cache on the CPU platform: jax 0.9.0's CPU AOT
# executable (de)serialization is broken on this host -- loading an entry
# segfaults ("Machine type used for XLA:CPU compilation doesn't match the
# machine type for execution ... SIGILL") and writing a large decode
# executable SIGABRTs, both observed killing the suite mid-run at
# test_pipeline. TPU executables cache fine (bench.py keeps using the
# host-keyed cache from utils/cache.py); CPU tests eat the recompiles.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Release compiled-executable state between modules.

    On this 1-core host, jaxlib's CPU compile path segfaulted reproducibly
    ~97 compiled programs into a suite run (backend_compile_and_load, also
    seen as SIGABRT in cache serialization before the persistent cache was
    disabled) while the same test passes in isolation -- accumulated
    in-process compiler state is the only difference. Dropping executables
    per module keeps the high-water mark bounded."""
    yield
    import jax
    jax.clear_caches()
