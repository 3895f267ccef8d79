"""Engine tests: end-to-end training, DP parity across mesh sizes,
checkpoint round-trip, multitask phase switching.

These go beyond the reference suite (which had no trainer tests) — they are
the multi-device gates SURVEY.md section 4 calls for.
"""
import numpy as np
import pytest

from pointvs_tpu.main import main as train_main

TRAIN_FLAGS = [
    '--train_data_root_pose', 'tests/resources',
    '--train_types_pose', 'tests/resources/test.types',
    '--test_data_root_pose', 'tests/resources',
    '--test_types_pose', 'tests/resources/test.types',
    '--layers', '2', '--egnn_attention', '--egnn_residual', '--egnn_tanh',
    '--egnn_normalise', '--graphnorm', '--compact', '--prefetch', '0',
]


def _read_preds(path):
    vals = []
    with open(path) as f:
        for line in f:
            chunks = line.split()
            if len(chunks) >= 3:
                vals.append(float(chunks[2]))
    return np.array(vals)


def _run(tmp_path, name, extra):
    save = str(tmp_path / name)
    train_main(['egnn', save, *TRAIN_FLAGS, *extra])
    return _read_preds(f'{save}/pose_predictions.txt')


def test_train_and_dp_parity(tmp_path):
    """1-device and 8-device training produce identical predictions: the
    global-mean loss normalisation makes gradients independent of the
    device layout."""
    p1 = _run(tmp_path, 'run1', ['-ep', '2', '-b', '2', '--num_devices', '1'])
    p8 = _run(tmp_path, 'run8', ['-ep', '2', '-b', '8', '--num_devices', '8'])
    assert len(p1) == len(p8) == 2
    np.testing.assert_allclose(p1, p8, atol=2e-4)


def test_strict_graphnorm_dp_parity(tmp_path):
    """--strict_graphnorm under data parallelism: whole-batch GraphNorm
    statistics psum over the dp axis, so an 8-device run normalises
    over the same GLOBAL batch a 1-device run does (ADVICE r4: without
    the psum, each device shard would normalise over batch/8 graphs and
    the two runs diverge)."""
    extra = ['-ep', '2', '-b', '8', '--strict_graphnorm']
    p1 = _run(tmp_path, 'sgn1', extra + ['--num_devices', '1'])
    p8 = _run(tmp_path, 'sgn8', extra + ['--num_devices', '8'])
    assert len(p1) == len(p8) == 2
    np.testing.assert_allclose(p1, p8, atol=2e-4)


def test_checkpoint_roundtrip_and_inference(tmp_path):
    from pointvs_tpu.inference import main as infer_main
    save = str(tmp_path / 'ckpt_run')
    train_main(['egnn', save, *TRAIN_FLAGS, '-ep', '1', '-b', '2',
                '--num_devices', '1'])
    trained = _read_preds(f'{save}/pose_predictions.txt')
    infer_main([save, 'tests/resources/test.types', 'tests/resources',
                '--output_fname', 'roundtrip.txt'])
    restored = _read_preds(f'{save}/pose_roundtrip.txt')
    np.testing.assert_allclose(trained, restored, atol=1e-6)


def test_multitask_both_phases(tmp_path):
    """Pose then affinity training with the shared-trunk multitask model
    (ref point_vs.py:256-271 sequential flow)."""
    save = str(tmp_path / 'multitask_run')
    train_main(['multitask', save,
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--train_data_root_affinity', 'tests/resources',
                '--train_types_affinity', 'tests/resources/test.types',
                '--model_task', 'both',
                '--layers', '2', '-ep', '1', '-ea', '1', '-b', '2',
                '--compact', '--egnn_attention', '--prefetch', '0',
                '--num_devices', '1'])
    import pathlib
    ckpts = sorted(p.name for p in
                   pathlib.Path(save, 'checkpoints').iterdir())
    assert 'pose_ckpt_epoch_1' in ckpts
    assert 'affinity_ckpt_epoch_1' in ckpts


def test_train_spec_prewarm_roundtrip(tmp_path):
    """A run records its packed train-step programs in train_spec.yaml
    (VERDICT r4 item #5); a SECOND run over the same save dir pre-warms
    from it (background compile + sticky-cap seeding) without touching
    the training trajectory: predictions match a run that never saw a
    spec file."""
    import pathlib
    import yaml
    # Streaming path only: the ids (device-resident) path ships no
    # packed programs, so there is nothing to record/pre-warm there.
    clean = _run(tmp_path, 'spec_a',
                 ['-ep', '2', '-b', '2', '--num_devices', '1',
                  '--device_cache', 'off'])
    spec = pathlib.Path(tmp_path, 'spec_a', 'train_spec.yaml')
    assert spec.exists()
    rec = yaml.safe_load(spec.read_text())
    assert rec['num_devices'] == 1 and rec['programs']
    p0 = rec['programs'][0]
    assert p0['task'] == 'classification' and p0['template'].startswith(
        'WireBatch')
    # Second run in the same dir: the prewarm thread consumes the spec.
    warmed = _run(tmp_path, 'spec_a', ['-ep', '2', '-b', '2',
                                       '--num_devices', '1',
                                       '--device_cache', 'off'])
    np.testing.assert_allclose(clean, warmed, atol=1e-6)


def test_nan_guard(tmp_path):
    """A diverging LR must abort with the NaN guard rather than continue
    silently (ref backprop :424-429)."""
    save = str(tmp_path / 'nan_run')
    with pytest.raises(FloatingPointError):
        train_main(['egnn', save, *TRAIN_FLAGS, '-ep', '50', '-b', '2',
                    '--num_devices', '1', '-lr', '1e12'])


def test_train_batch_observability(tmp_path):
    """Training logs the reference's per-batch mean active/decoy
    predictions (ref point_neural_network_base.py:387-415) — folded into
    the deferred loss fetch, so they must appear in metrics.jsonl."""
    import json
    save = str(tmp_path / 'obs_run')
    train_main(['egnn', save, *TRAIN_FLAGS, '-ep', '1', '-b', '2',
                '--num_devices', '1'])
    keys = set()
    with open(f'{save}/metrics.jsonl') as f:
        for line in f:
            keys.update(json.loads(line))
    assert 'Mean active prediction (train)' in keys
    assert 'Mean inactive prediction (train)' in keys
