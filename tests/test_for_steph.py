"""End-to-end raw-input pipeline test (ported shape of the reference's
test_for_steph.py: the reference asserted a golden prediction from a
checked-in trained checkpoint whose weights blob is stripped from the
mirror; here we train a tiny multi-regression model first and assert the
pipeline layout + format instead)."""
from pathlib import Path

import numpy as np

from pointvs_tpu.main import main as train_main
from pointvs_tpu.scripts.for_steph import (
    generate_types_file,
    predict_on_molecular_inputs,
)


def test_generate_types_file(tmp_path):
    manifest = tmp_path / 'inputs.txt'
    manifest.write_text('resources/7zzp_rec_0.pdb resources/7zzp_lig_0.sdf\n')
    out = tmp_path / 'out.types'
    generate_types_file(manifest, out)
    assert out.read_text() == \
        'resources/7zzp_rec_0.parquet resources/7zzp_lig_0.parquet\n'


def test_predict_on_molecular_inputs(tmp_path):
    # 1) train a tiny affinity model on the fixture data
    model_dir = tmp_path / 'model'
    types = tmp_path / 'affinity.types'
    types.write_text(
        '4.0 4.1 4.2 rec_0.parquet lig_0.parquet\n'
        '5.0 5.1 5.2 rec_0.parquet lig_0.parquet\n')
    train_main(['egnn', str(model_dir),
                '--train_data_root_affinity', 'tests/resources',
                '--train_types_affinity', str(types),
                '--model_task', 'multi_regression', '--layers', '2',
                '-ea', '1', '-b', '2', '--compact', '--prefetch', '0',
                '--num_devices', '1'])

    # 2) raw pdb/sdf -> parquet -> predictions
    manifest = tmp_path / 'inputs.txt'
    manifest.write_text(
        'resources/7zzp_rec_0.pdb resources/7zzp_lig_0.sdf\n')
    out_dir = tmp_path / 'out'
    out_dir.mkdir()
    preds = predict_on_molecular_inputs(
        input_fnames=manifest, data_root=Path('tests'),
        model_path=model_dir, output_dir=out_dir)

    assert preds.name == 'affinity_predictions.txt'
    line = preds.read_text().strip()
    chunks = line.split()
    # `pKi pKd pIC50 rec lig` with the ' | ' separator stripped
    assert len(chunks) == 5
    vals = [float(c) for c in chunks[:3]]
    assert all(np.isfinite(vals))
    assert chunks[3].endswith('7zzp_rec_0.parquet')
    assert chunks[4].endswith('7zzp_lig_0.parquet')
    assert (out_dir / 'parquets' / 'resources' /
            '7zzp_lig_0.parquet').exists()
