"""Tests for the structure-parsing layer (types_to_parquet + chem).

Pin the smina-typing semantics on canonical cases: the collapsed 10-channel
map, carbon aromaticity/hydrophobicity, N/O donor adjustment via residue
templates, water exclusion, and the parquet schema
(ref types_to_parquet.py:548-791, SURVEY.md section 2.5).
"""
import numpy as np
import pandas as pd
import pytest

from pointvs_tpu.dataset_generation.chem import parse_pdb, parse_sdf
from pointvs_tpu.dataset_generation.types_to_parquet import (
    StructuralFileParser,
)

LIG_SDF = 'tests/resources/7zzp_lig_0.sdf'
REC_PDB = 'tests/resources/7zzp_rec_0.pdb'


@pytest.fixture(scope='module')
def receptor_frame():
    parser = StructuralFileParser('receptor')
    mol = parse_pdb(REC_PDB)
    df = parser.file_to_parquets(REC_PDB)
    return mol, df


def test_type_map_collapses_to_10_channels():
    parser = StructuralFileParser('ligand')
    assert parser.n_features == 11  # 10 groups + 1 catch-all
    extended = StructuralFileParser('ligand', extended=True)
    # 18 groups but Sodium/Potassium never matches an atom-table entry, so
    # 17 distinct channels + catch-all (the reference parser behaves the
    # same; its *dataset* hardcodes 19 — a latent inconsistency).
    assert extended.n_features == 18


def test_sdf_parsing_and_typing():
    parser = StructuralFileParser('ligand')
    df = parser.file_to_parquets(LIG_SDF)
    # 15 atoms in the SDF, 6 are hydrogens -> 9 heavy
    assert len(df) == 9
    assert list(df.columns) == ['x', 'y', 'z', 'atomic_number', 'types',
                                'bp']
    assert (df.bp == 0).all()
    assert df.types.between(0, 10).all()
    # aromatic ring carbons typed as aromatic channels (2 or 3)
    aromatic_c = df[(df.atomic_number == 6) & df.types.isin([2, 3])]
    assert len(aromatic_c) >= 4


def test_pdb_residue_typing(receptor_frame):
    mol, df = receptor_frame
    heavy = [a for a in mol.atoms
             if a.element != 1 and a.residue_name.lower() != 'hoh']
    assert len(heavy) == len(df)
    by_case = {}
    for row_idx, atom in enumerate(heavy):
        key = (atom.residue_name, atom.name)
        by_case.setdefault(key, int(df.iloc[row_idx].types))
    # Backbone amide N: donor -> channel 5; proline N: no H -> channel 4.
    assert by_case[('GLY', 'N')] == 5
    assert by_case[('PRO', 'N')] == 4
    # Carbonyl O: acceptor only -> 6; hydroxyls (SER OG, TYR OH): donor -> 7
    assert by_case[('GLY', 'O')] == 6
    assert by_case[('SER', 'OG')] == 7
    assert by_case[('TYR', 'OH')] == 7
    # PHE ring carbon, carbon-only neighbours -> aromatic hydrophobe (2)
    assert by_case[('PHE', 'CG')] == 2
    # TYR CZ bonded to OH oxygen -> aromatic non-hydrophobe (3)
    assert by_case[('TYR', 'CZ')] == 3
    # Aliphatic CB with only C/H neighbours -> hydrophobe (0); backbone C
    # (bonded to O) -> non-hydrophobe (1)
    assert by_case[('ALA', 'CB')] == 0
    assert by_case[('ALA', 'C')] == 1
    # Receptor flag
    assert (df.bp == 1).all()


def test_waters_excluded(receptor_frame):
    mol, df = receptor_frame
    assert not any(a.residue_name.lower() == 'hoh' for a in mol.atoms)


def test_parquet_roundtrip(tmp_path):
    parser = StructuralFileParser('ligand')
    parser.file_to_parquets(LIG_SDF, tmp_path, 'lig.parquet',
                            add_polar_hydrogens=False)
    df = pd.read_parquet(tmp_path / 'lig.parquet')
    assert len(df) == 9
    assert df.dtypes['x'] == np.float64
    assert df.dtypes['types'] == np.int64


def test_feature_pipeline_integration(tmp_path):
    """Raw SDF/PDB -> parquet -> dataset -> GraphSample (for_steph-style
    minimum slice, ref scripts/for_steph.py)."""
    from pointvs_tpu.data.dataset import PointCloudDataset
    lig_parser = StructuralFileParser('ligand')
    rec_parser = StructuralFileParser('receptor')
    lig_parser.file_to_parquets(LIG_SDF, tmp_path, 'lig.parquet',
                                add_polar_hydrogens=False)
    rec_parser.file_to_parquets(REC_PDB, tmp_path, 'rec.parquet',
                                add_polar_hydrogens=False)
    types = tmp_path / 'test.types'
    types.write_text('1 -1 -1.0 rec.parquet lig.parquet\n')
    ds = PointCloudDataset(
        tmp_path, radius=6, polar_hydrogens=False, compact=True,
        types_fname=types, edge_radius=4, estimate_bonds=True,
        model_task='classification')
    sample = ds[0]
    assert sample.num_nodes > 9       # ligand + pocket atoms
    assert sample.num_edges > 0
    assert sample.node_feats.shape[1] == 12
