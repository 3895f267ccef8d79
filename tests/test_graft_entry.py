"""Regression tests for the driver entry points in __graft_entry__.py.

Round-1 driver gate failure: the driver process initialised the (remote,
single-chip) jax backend BEFORE calling ``dryrun_multichip(8)``, after which
``jax.config.update('jax_platforms', 'cpu')`` is a silent no-op and the
dryrun aborted with "need 8 devices, have 1".  The fix re-execs the dryrun
in a fresh CPU-only child process whenever the in-process backend cannot
provide the requested device count.  This test reproduces the failure mode:
a subprocess initialises a 1-device backend first, then calls the dryrun.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_survives_preinitialised_backend():
    code = (
        "import os; os.environ.pop('XLA_FLAGS', None);"
        "import jax; jax.devices();"          # backend init: 1 device only
        "assert len(jax.devices()) == 1;"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    env = dict(os.environ)
    # CPU in the outer child keeps the test hermetic and fast; the failure
    # mode (initialised 1-device backend) is identical to the TPU case.
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env.pop('_POINTVS_DRYRUN_CHILD', None)
    proc = subprocess.run(
        [sys.executable, '-c', code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'dryrun_multichip(8) OK' in proc.stdout
    assert 'dryrun 2-D mesh OK' in proc.stdout
