"""Driver-facing entry points, invoked exactly as the driver invokes them.

The driver compile-checks `entry()` single-chip and runs
`python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"`
on a host that may have a single device. Round 1 shipped a dryrun that
asserted on the 1-device host (MULTICHIP_r01.json rc=1); these tests pin the
literal invocation so that can never regress silently.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    """Run the driver's literal command in a fresh interpreter.

    The parent process here deliberately does NOT get a CPU platform forced
    into its environment: dryrun_multichip itself must provision the virtual
    mesh in a child when the host has too few devices. We do force CPU for
    the *outer* interpreter (no TPU tunnel in CI), which still leaves it a
    1-device host -- the exact shape of the driver failure.
    """
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # No xla_force_host_platform_device_count: the outer interpreter sees one
    # device, so dryrun_multichip must re-exec with a self-provisioned mesh.
    env.pop('XLA_FLAGS', None)
    # no persistent cache: CPU AOT (de)serialization crashes on this host
    # (see tests/conftest.py)
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    res = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__; __graft_entry__.dryrun_multichip(8)'],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])


def test_entry_compiles_single_chip():
    """entry() must return (jittable_fn, example_args) that lower + compile."""
    import jax

    sys.path.insert(0, ROOT)
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args).compile()
