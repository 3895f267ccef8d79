"""Hotspot maps: consensus protein-atom rankings over fragment screens.

Ref parity: point_vs/attribution/hotspot.py — rank protein atoms across
many fragment-bound complexes of one target and emit a pharmacophore-like
table of consistently high-attribution positions (for hotspot maps).
Builds on multiple_ligands.rank_protein_atoms; the RDKit fake-atom mol
export is gated.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from pointvs_tpu.attribution.attribution_fns import ATTRIBUTION_FNS
from pointvs_tpu.attribution.multiple_ligands import rank_protein_atoms
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import load_model
from pointvs_tpu.utils import expand_path, mkdir

LOG = get_logger('PointVS-TPU')


def hotspot_pharmacophores(rank_df: pd.DataFrame, top_n: int = 20,
                           min_complexes: int = 2) -> pd.DataFrame:
    """Top consensus positions seen in at least min_complexes complexes."""
    df = rank_df[rank_df.n_complexes >= min_complexes]
    return df.head(top_n).reset_index(drop=True)


def write_fake_atom_mol(df: pd.DataFrame, fname, element: str = 'Du'):
    """Write hotspot positions as a fake-atom SDF for viewers.

    Plain V2000 writer (the RDKit path below mirrors the reference's mol
    export; a hotspot 'molecule' is just positioned dummy atoms, which
    needs no chemistry library).
    """
    lines = ['hotspots', '  PointVS-TPU', '']
    lines.append(f'{len(df):3d}{0:3d}  0  0  0  0  0  0  0  0999 V2000')
    for _, row in df.iterrows():
        lines.append(f'{row.x:10.4f}{row.y:10.4f}{row.z:10.4f} '
                     f'{element:<3s}'
                     f'0  0  0  0  0  0  0  0  0  0  0  0')
    lines += ['M  END', '$$$$', '']
    Path(expand_path(fname)).write_text('\n'.join(lines))


def pharmacophore_from_smina_type(smina_type: str,
                                  lig_pharm: str = 'none') -> str:
    """Smina atom type -> pharmacophore class (ref hotspot.py:268-281).

    Ambiguous O/N/S and DonorAcceptor types resolve by complementing the
    interacting ligand pharmacophore when one is known."""
    if smina_type in ('Oxygen', 'Nitrogen', 'Sulfur') or \
            smina_type.endswith('DonorAcceptor'):
        if lig_pharm == 'hba':
            return 'hbd'
        if lig_pharm == 'hbd':
            return 'hba'
        return 'none'
    if smina_type.endswith('Donor'):
        return 'hbd'
    if smina_type.endswith('Acceptor'):
        return 'hba'
    return 'none'


def scores_to_pharmacophore_df(reference_structure, rank_df: pd.DataFrame,
                               use_rank: bool = False) -> pd.DataFrame:
    """Map consensus GNN atom scores onto a reference protein structure
    and type each scored atom (ref hotspot.py:239-332).

    Returns a DataFrame with x, y, z, vdw_radius, smina_type,
    pharmacophore and score, sorted by score. Works on both chemistry
    backends (openbabel, or the pure-Python fallback parser).
    """
    import numpy as np
    from pointvs_tpu.constants import AA_TRIPLET_CODES, VDW_RADII
    from pointvs_tpu.dataset_generation.types_to_parquet import \
        StructuralFileParser
    from pointvs_tpu.utils import PositionDict

    score_of = PositionDict(eps=1e-2)
    lig_pharm_of = PositionDict(eps=1e-2)
    for _, row in rank_df.iterrows():
        key = (row.x, row.y, row.z)
        score_of[key] = float(row.get('mean_attribution',
                                      row.get('mean_score', 0.0)))
        lig_pharm_of[key] = row.get('lig_pharm', 'none')

    parser = StructuralFileParser('receptor')
    mol = parser.read_file(reference_structure)[0]
    rows = []
    missing_score = (-1) ** (1 - use_rank) * np.inf
    for x, y, z, atomic_num, smina_type, resname in \
            parser.mol_typed_atoms(mol):
        if resname and resname not in AA_TRIPLET_CODES:
            continue
        key = (x, y, z)
        score = score_of[key] if key in score_of else missing_score
        lig_pharm = lig_pharm_of[key] if key in lig_pharm_of else 'none'
        rows.append({
            'x': x, 'y': y, 'z': z,
            'vdw_radius': VDW_RADII.get(atomic_num, 1.5),
            'smina_type': smina_type,
            'pharmacophore': pharmacophore_from_smina_type(
                smina_type, lig_pharm),
            'score': score})
    return pd.DataFrame(rows).sort_values(
        'score', ascending=use_rank).reset_index(drop=True)


def pharmacophore_df_to_mols(df: pd.DataFrame, use_rank: bool = False,
                             cutoff: int = 0,
                             include_donor_acceptors: bool = False):
    """Pharmacophore df -> (hba_mol, hbd_mol) RDKit fake-atom molecules:
    acceptors as phosphorus, donors as iodine, with per-atom score/vdw
    properties (ref hotspot.py:332-381). Needs RDKit."""
    import numpy as np
    from rdkit import Chem
    res = []
    included = [['hba'], ['hbd']]
    if include_donor_acceptors:
        included[0].append('hbda')
        included[1].append('hbda')
    for atom_type, pharm_types in zip(('P', 'I'), included):
        sub = df[df['pharmacophore'].isin(pharm_types)].copy()
        sub.sort_values(by='score', ascending=use_rank, inplace=True)
        if cutoff:
            sub = sub[:cutoff]
        sub = sub[np.isfinite(sub['score'])]
        if not use_rank:
            sub = sub[sub['score'] > 0]
        mol = Chem.MolFromSmiles(atom_type * max(len(sub), 0)) \
            if len(sub) else Chem.RWMol()
        if len(sub):
            conf = Chem.Conformer(mol.GetNumAtoms())
            for idx, (_, row) in enumerate(sub.iterrows()):
                conf.SetAtomPosition(idx,
                                     [row['x'], row['y'], row['z']])
            conf.SetId(0)
            mol.AddConformer(conf)
            mol.SetProp('score',
                        '\n'.join(str(s) for s in sub['score']))
            mol.SetProp('vdw',
                        '\n'.join(str(v) for v in sub['vdw_radius']))
        res.append(mol)
    return tuple(res)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('model')
    ap.add_argument('receptor')
    ap.add_argument('fragments', nargs='+',
                    help='Fragment ligand files bound to the receptor')
    ap.add_argument('--attribution', default='atom_masking')
    ap.add_argument('--output_dir', '-o', default='hotspot_out')
    ap.add_argument('--top_n', type=int, default=20)
    ap.add_argument('--apo_protein', default=None,
                    help='Reference PDB/structure to type pharmacophores '
                         'against (enables hba/hbd typed outputs, ref '
                         'hotspot.py scores_to_pharmacophore_df)')
    ap.add_argument('--cutoff', '-c', type=int, default=7,
                    help='Top-N scoring atoms kept as pharmacophores')
    ap.add_argument('--include_donor_acceptors', '-i', action='store_true')
    args = ap.parse_args(argv)

    out = mkdir(args.output_dir)
    trainer, _, _ = load_model(args.model)
    ranks = rank_protein_atoms(
        trainer, args.receptor, args.fragments,
        ATTRIBUTION_FNS[args.attribution])
    ranks.to_csv(out / 'hotspot_ranks.csv', index=False)
    pharm = hotspot_pharmacophores(ranks, top_n=args.top_n)
    pharm.to_csv(out / 'pharmacophores.csv', index=False)
    write_fake_atom_mol(pharm, out / 'hotspots.sdf')

    if args.apo_protein:
        typed = scores_to_pharmacophore_df(args.apo_protein, ranks)
        typed.to_csv(out / 'typed_pharmacophores.csv', index=False)
        try:
            hba, hbd = pharmacophore_df_to_mols(
                typed, cutoff=args.cutoff,
                include_donor_acceptors=args.include_donor_acceptors)
            from rdkit import Chem
            with Chem.SDWriter(str(out / 'hba.sdf')) as w:
                w.write(hba)
            with Chem.SDWriter(str(out / 'hbd.sdf')) as w:
                w.write(hbd)
        except ImportError:
            # RDKit-free fallback: same positions, plain SDF writer.
            sub = typed[typed.pharmacophore == 'hba'][:args.cutoff]
            write_fake_atom_mol(sub, out / 'hba.sdf', element='P')
            sub = typed[typed.pharmacophore == 'hbd'][:args.cutoff]
            write_fake_atom_mol(sub, out / 'hbd.sdf', element='I')
    LOG.info(f'Hotspot outputs in {out}')


if __name__ == '__main__':
    main()
