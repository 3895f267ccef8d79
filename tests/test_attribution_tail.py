"""Attribution tail tools: hotspot pharmacophore typing, gromacs .gro
conversion/parsing, and the RCSB offline cache (round-1 VERDICT gaps)."""
import numpy as np
import pandas as pd
import pytest

from .setup_and_params import RESOURCES

REC_PDB = RESOURCES / '7zzp_rec_0.pdb'


def test_hotspot_pharmacophore_typing():
    from pointvs_tpu.attribution.hotspot import (
        pharmacophore_from_smina_type, scores_to_pharmacophore_df)
    # classification rules (ref hotspot.py:268-281)
    assert pharmacophore_from_smina_type('OxygenXSAcceptor') == 'hba'
    assert pharmacophore_from_smina_type('NitrogenXSDonor') == 'hbd'
    assert pharmacophore_from_smina_type('NitrogenXSDonorAcceptor') == 'none'
    assert pharmacophore_from_smina_type(
        'NitrogenXSDonorAcceptor', lig_pharm='hba') == 'hbd'
    assert pharmacophore_from_smina_type('Oxygen', lig_pharm='hbd') == 'hba'
    assert pharmacophore_from_smina_type(
        'AliphaticCarbonXSHydrophobe') == 'none'

    from pointvs_tpu.dataset_generation.types_to_parquet import \
        StructuralFileParser
    parser = StructuralFileParser('receptor')
    atoms = list(parser.mol_typed_atoms(parser.read_file(REC_PDB)[0]))
    assert len(atoms) > 100
    rank_df = pd.DataFrame(
        [{'x': a[0], 'y': a[1], 'z': a[2],
          'mean_attribution': 0.1 * (i + 1), 'n_complexes': 2}
         for i, a in enumerate(atoms[:20])])
    df = scores_to_pharmacophore_df(REC_PDB, rank_df)
    assert set(df.columns) >= {'x', 'y', 'z', 'vdw_radius', 'smina_type',
                               'pharmacophore', 'score'}
    # all 20 scored atoms matched back onto the structure by coordinates
    assert int(np.isfinite(df.score).sum()) == 20
    assert (df.pharmacophore.isin(('hba', 'hbd', 'hbda', 'none'))).all()
    assert 'hba' in set(df.pharmacophore)


def test_gro_to_pdb_roundtrip(tmp_path):
    from pointvs_tpu.attribution.gromacs import (
        gro_to_pdb, parse_gromacs_file, remove_solvent_pdb)
    gro = tmp_path / 'frame.gro'
    gro.write_text(
        'MD frame\n'
        '    4\n'
        '    1MOL     C1    1   0.100   0.200   0.300\n'
        '    1MOL     N1    2   0.400   0.500   0.600\n'
        '    2HOH     OW    3   1.000   1.000   1.000\n'
        '    3ALA     CA    4   0.700   0.800   0.900\n'
        '   2.0 2.0 2.0\n')
    pdb = tmp_path / 'frame.pdb'
    gro_to_pdb(gro, pdb)
    text = pdb.read_text()
    assert 'ATOM' in text
    # nm -> Angstrom conversion
    assert '1.000' in text and '2.000' in text and '3.000' in text
    id_map = parse_gromacs_file(gro)
    assert id_map[(1.0, 2.0, 3.0)] == '1:MOL:C1'
    assert (7.0, 8.0, 9.0) in id_map
    assert (10.0, 10.0, 10.0) not in id_map  # water excluded

    remove_solvent_pdb(pdb)
    assert 'HOH' not in pdb.read_text()


def test_pdb_download_uses_offline_cache(tmp_path, monkeypatch):
    from pointvs_tpu.dataset_generation.types_to_parquet import \
        StructuralFileParser
    cache = tmp_path / 'pdbcache'
    cache.mkdir()
    (cache / '1abc.pdb').write_text('HEADER    FAKE\nEND\n')
    monkeypatch.setenv('POINTVS_PDB_CACHE', str(cache))

    def boom(*a, **k):
        raise AssertionError('network touched despite cache hit')
    import urllib.request
    monkeypatch.setattr(urllib.request, 'urlopen', boom)
    out = StructuralFileParser.download_pdb_file('1ABC', tmp_path / 'run')
    assert out.read_text().startswith('HEADER    FAKE')


def test_constrained_attribution_mcs_gated():
    """Without RDKit the MCS path raises a clear error instead of a
    silent wrong answer; with RDKit it is exercised for real."""
    from pointvs_tpu.attribution.constrained_attribution import \
        mcs_core_coords
    try:
        import rdkit  # noqa: F401
    except ImportError:
        with pytest.raises((ImportError, ModuleNotFoundError)):
            mcs_core_coords([RESOURCES / '7zzp_lig_0.sdf'])
        return
    cores = mcs_core_coords([RESOURCES / '7zzp_lig_0.sdf'])
    assert len(cores) == 1


def test_hbond_cgo_objects_pure():
    """CGO cylinder geometry/colour maths without a PyMOL install
    (ref plip_subclasses.py:69-186 show_hbonds colour ramp)."""
    from pointvs_tpu.attribution.plip_subclasses import (
        CYLINDER, get_colour_interpolation_fn, hbond_cgo_objects)
    interp = get_colour_interpolation_fn([1, 0, 1], [1, 1, 1], 0.0, 1.0)
    assert interp(0.0) == [1.0, 0.0, 1.0]
    assert interp(1.0) == [1.0, 1.0, 1.0]
    assert interp(0.5) == [1.0, 0.5, 1.0]

    bonds = {'a-b': ((0, 0, 0), (1, 0, 0), 0.9),
             'c-d': ((0, 1, 0), (0, 2, 0), 0.1)}
    objs = hbond_cgo_objects(bonds)
    assert len(objs) == 2
    name, cgo, label, mid = objs[0]
    assert cgo[0] == CYLINDER
    assert cgo[1:7] == [0.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    assert cgo[7] == 0.08                 # radius
    assert len(cgo) == 14                 # opcode + 2 pts + r + 2 colours
    assert label == '0.9'
    assert mid == [0.5, 0.0, 0.0]
    # highest-score bond gets the magenta end of the ramp (default
    # inverse_colour=False flips the scale, ref :165-170)
    assert cgo[8:11] == [1.0, 0.0, 1.0]
    assert objs[1][1][8:11] == [1.0, 1.0, 1.0]


def test_top_bond_map():
    from pointvs_tpu.attribution.process_pdb import _top_bond_map
    scored = pd.DataFrame({
        'x': [0.0, 10.0, 0.5, 50.0],
        'y': [0.0, 10.0, 0.0, 50.0],
        'z': [0.0, 10.0, 0.0, 50.0],
        'bp': [0, 0, 1, 1],
        'attribution': [0.9, 0.8, 0.0, 0.0]})
    bonds = _top_bond_map(scored)
    assert len(bonds) == 1            # second ligand atom too far (>4 A)
    (p1, p2, score), = bonds.values()
    assert p1 == (0.0, 0.0, 0.0) and p2 == (0.5, 0.0, 0.0)
    assert score == 0.9
