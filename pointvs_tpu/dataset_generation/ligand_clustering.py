"""Ligand clustering by Tanimoto similarity of Morgan fingerprints.

Ref parity: point_vs/dataset_generation/ligand_clustering.py. RDKit (a C++
cheminformatics library) computes the fingerprints; this module is
import-gated on it, like every chemistry-tool dependency in this codebase
(the device path never touches it).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, get_n_cols, mkdir

LOG = get_logger('PointVS-TPU')

try:  # pragma: no cover - depends on image
    from rdkit.Chem import AllChem, MolFromMol2File, SDMolSupplier
    from rdkit.DataStructs import TanimotoSimilarity, UIntSparseIntVect
    HAVE_RDKIT = True
except ImportError:
    HAVE_RDKIT = False


def _require_rdkit():
    if not HAVE_RDKIT:
        raise ImportError(
            'RDKit is required for ligand clustering but is not installed '
            'in this environment.')


def get_fingerprint(mol):
    _require_rdkit()
    if isinstance(mol, UIntSparseIntVect):
        return mol
    return AllChem.GetMorganFingerprint(mol, 3)


def is_similar(mol1, mol2, cutoff: float) -> bool:
    """Tanimoto similarity of Morgan(3) fingerprints >= cutoff."""
    _require_rdkit()
    return TanimotoSimilarity(
        get_fingerprint(mol1), get_fingerprint(mol2)) >= cutoff


def get_mol(sdf):
    """Read the first molecule of an sdf (mol2 fallback) -> fingerprint."""
    _require_rdkit()
    mol = next(SDMolSupplier(str(sdf)), None)
    if mol is None:
        mol2 = str(sdf).replace('.sdf', '.mol2')
        if Path(mol2).is_file():
            mol = MolFromMol2File(mol2)
    if mol is None:
        raise RuntimeError(f'Molecule could not be read: {sdf}')
    return AllChem.GetMorganFingerprint(mol, 3)


def get_mols(directory, pdbid_file=None, types_file=None):
    """{pdbid-or-path: fingerprint} for ligands under a PDBBind-style
    tree (`<dir>/<pdbid>/<pdbid>_ligand.sdf`)."""
    _require_rdkit()
    assert not (pdbid_file is None and types_file is None)
    ligs = None
    if types_file is not None:
        n_cols = get_n_cols(types_file)
        df = pd.read_csv(
            expand_path(types_file), sep=r'\s+',
            names=('x', 'y', 'z', 'rec', 'lig',
                   *[str(i) for i in range(max(0, n_cols - 5))]))
        ligs = {str(s).replace('.parquet', '.sdf') for s in df['lig']}
    pdbids = None
    if pdbid_file is not None:
        with open(expand_path(pdbid_file), 'r', encoding='utf-8') as f:
            pdbids = {s.strip() for s in f}

    mols, missing = {}, []
    for sdf in expand_path(directory).glob('*/*_ligand.sdf'):
        if pdbids is not None and sdf.parent.name not in pdbids:
            continue
        if ligs is not None:
            leaf = str(sdf.relative_to(expand_path(directory)))
            if leaf not in ligs:
                continue
        try:
            mols[sdf.parent.name] = get_mol(sdf)
        except RuntimeError:
            missing.append(sdf)
    if missing:
        LOG.warning(f'{len(missing)} ligands could not be read')
    return mols


def find_similar_pairs(test_mols: dict, train_mols: dict,
                       cutoff: float = 0.9):
    """Train-set keys whose ligand is similar to any test ligand."""
    _require_rdkit()
    contaminated = set()
    for train_key, train_fp in train_mols.items():
        for test_fp in test_mols.values():
            if TanimotoSimilarity(train_fp, test_fp) >= cutoff:
                contaminated.add(train_key)
                break
    return contaminated


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('directory', help='PDBBind-style structure tree')
    ap.add_argument('test_pdbids')
    ap.add_argument('train_types')
    ap.add_argument('output_types')
    ap.add_argument('--cutoff', '-c', type=float, default=0.9)
    args = ap.parse_args(argv)
    _require_rdkit()

    test_mols = get_mols(args.directory, pdbid_file=args.test_pdbids)
    train_mols = get_mols(args.directory, types_file=args.train_types)
    contaminated = find_similar_pairs(test_mols, train_mols, args.cutoff)
    LOG.info(f'{len(contaminated)} train ligands similar to test set')

    kept = []
    with open(expand_path(args.train_types), 'r', encoding='utf-8') as f:
        for line in f:
            if not any(pdbid in line for pdbid in contaminated):
                kept.append(line)
    with open(expand_path(args.output_types), 'w', encoding='utf-8') as f:
        f.writelines(kept)


if __name__ == '__main__':
    main()
