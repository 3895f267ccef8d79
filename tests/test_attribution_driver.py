"""End-to-end attribution driver test: train -> attribute() -> CSV +
B-factor PDB + interaction-labelled precision/recall artefacts."""
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from pointvs_tpu.main import main as train_main


@pytest.fixture(scope='module')
def trained_model(tmp_path_factory):
    save = tmp_path_factory.mktemp('attr_model')
    train_main(['egnn', str(save),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--layers', '2', '-ep', '1', '-b', '2', '--compact',
                '--egnn_attention', '--node_attention',
                '--softmax_attention', '--prefetch', '0',
                '--num_devices', '1'])
    return save


def test_attribute_parquet_inputs(trained_model, tmp_path):
    from pointvs_tpu.attribution.attribution import attribute
    scored = attribute(
        'cam', trained_model, tmp_path,
        rec='tests/resources/rec_0.parquet',
        lig='tests/resources/lig_0.parquet',
        radius=6, edge_radius=4)
    assert 'attribution' in scored
    assert (tmp_path / 'cam_scores.csv').exists()
    labelled = tmp_path / 'cam_labelled.csv'
    if labelled.exists():
        df = pd.read_csv(labelled)
        assert {'hbd', 'hba', 'interaction'} <= set(df.columns)


def test_attribute_pdb_input(trained_model, tmp_path):
    from pointvs_tpu.attribution.attribution import attribute
    scored = attribute(
        'node_attention', trained_model, tmp_path,
        rec='tests/resources/7zzp_rec_0.pdb',
        lig='tests/resources/7zzp_lig_0.sdf',
        radius=8, edge_radius=4)
    out_pdb = tmp_path / 'node_attention_bfactors.pdb'
    assert out_pdb.exists()
    # B-factors of pocket atoms overwritten with scores
    lo = scored.attribution.min() - 0.011
    hi = scored.attribution.max() + 0.011
    stamped = 0
    for line in open(out_pdb):
        if line.startswith(('ATOM', 'HETATM')):
            try:
                b = float(line[60:66])
            except ValueError:
                continue
            if lo <= b <= hi:
                stamped += 1
    assert stamped > 10


def test_process_pdb_site_detection():
    from pointvs_tpu.attribution.process_pdb import find_ligand_sites
    sites = find_ligand_sites('tests/resources/7zzp_rec_0.pdb')
    # sites list may be empty if the fixture has no HETATM ligands, but
    # the call must be well-formed
    assert isinstance(sites, list)
