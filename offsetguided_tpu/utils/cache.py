"""Host-keyed persistent compilation cache directory.

The driver environment migrates between machines across sessions while /tmp
persists. JAX's persistent cache stores CPU AOT executables whose machine
features are NOT part of the cache key; loading an executable compiled on a
host with different CPU features warns (`cpu_aot_loader.cc ... could lead to
execution errors such as SIGILL`) or outright segfaults (observed killing the
test suite mid-run). Keying the directory by the host's CPU flag set makes a
machine change a cache miss instead of a crash.
"""
from __future__ import annotations

import hashlib


def _host_fingerprint() -> str:
    """CPU-feature hash, or '' when the host exposes nothing distinguishing
    (callers must then DISABLE the persistent cache rather than share a
    constant key across unknown hosts)."""
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    u = platform.uname()
    blob = '|'.join((platform.processor(), u.machine, u.system, u.version))
    if blob.strip('|'):
        return hashlib.md5(blob.encode()).hexdigest()[:10]
    return ''


def host_cache_dir(base: str) -> str:
    """'/tmp/jax_x_cache' -> '/tmp/jax_x_cache_<cpu-flags-hash>', or '' when
    the host cannot be fingerprinted (cache must stay off)."""
    fp = _host_fingerprint()
    return f'{base}_{fp}' if fp else ''


def enable_persistent_cache(base: str, min_compile_secs: float = 1.0) -> str:
    import jax
    path = host_cache_dir(base)
    if not path:
        return ''   # unidentifiable host: a shared key risks foreign-AOT SIGILL
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_secs)
    return path


def enable_persistent_cache_if_accelerated(
        base: str = '/tmp/jax_og_cache', min_compile_secs: float = 1.0) -> str:
    """Enable the cache only on accelerator backends.

    TPU executables (de)serialize fine and tunnel compiles cost minutes, so
    caching is a large win there; CPU AOT (de)serialization is broken on
    some hosts (SIGABRT writing large decode executables, SIGILL loading
    them — see tests/conftest.py), so CPU runs eat the recompiles instead.
    """
    import jax
    if jax.default_backend() == 'cpu':
        return ''
    return enable_persistent_cache(base, min_compile_secs)
