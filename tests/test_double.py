"""--double (float64) smoke test (VERDICT r3 weak #4).

The reference's --double is torch.set_default_dtype(torch.float64)
(ref point_vs.py:46-51). Here it must mean REAL f64 training on the CPU
backend — f64 params, f64 compute, f64 checkpoints that reload as f64 —
never a silent f32 path. TPU backends hard-error (no f64 hardware);
main.py gates that before enabling x64.

x64 is process-global jax state, so the CLI run executes in a
subprocess; the same subprocess reloads the checkpoint and asserts the
parameter dtype.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

WORKER = r'''
import sys

import numpy as np
import jax

# sitecustomize imports jax pinned to the axon TPU platform before env
# vars are read; the config update is the only reliable CPU switch.
jax.config.update("jax_platforms", "cpu")

out = sys.argv[1]
from pointvs_tpu.main import main
main(["egnn", out,
      "--train_data_root_pose", "tests/resources",
      "--train_types_pose", "tests/resources/test.types",
      "--test_data_root_pose", "tests/resources",
      "--test_types_pose", "tests/resources/test.types",
      "--layers", "2", "--egnn_attention", "--compact",
      "--prefetch", "0", "-ep", "2", "-b", "2",
      "--num_devices", "1", "--double"])
assert jax.config.jax_enable_x64, "--double did not enable x64"

# Reload through the standard discovery path: the checkpoint must come
# back as float64 (load_model re-enables x64 from cmd_args.yaml).
from pointvs_tpu.models.load_model import load_model
import jax.numpy as jnp
trainer, _, _ = load_model(out, num_devices=1)
bad = sorted({str(l.dtype) for l in jax.tree.leaves(trainer.params)
              if jnp.issubdtype(l.dtype, jnp.floating)
              and l.dtype != jnp.float64})
assert not bad, f"non-f64 float params after --double reload: {bad}"

vals = []
with open(out + "/pose_predictions.txt") as f:
    for line in f:
        parts = line.split()
        if len(parts) >= 3:
            vals.append(float(parts[2]))
assert vals and np.all(np.isfinite(vals)), "non-finite --double preds"
print("DOUBLE_OK")
'''


def test_double_trains_in_f64(tmp_path):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    env.pop('PYTEST_CURRENT_TEST', None)
    proc = subprocess.run(
        [sys.executable, '-c', WORKER, str(tmp_path / 'dbl')],
        cwd=REPO, env=env, capture_output=True, timeout=600)
    log = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, f'--double worker failed:\n{log}'
    assert 'DOUBLE_OK' in log
