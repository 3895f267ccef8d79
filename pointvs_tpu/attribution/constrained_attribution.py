"""Constrained-docking attribution: score + distance-vs-score analysis.

Ref parity: point_vs/attribution/constrained_attribution.py — for a series
of constrained-docked ligands against one receptor, score each complex,
and relate ligand-atom attribution to distance from the conserved core
(the reference used RDKit FindMCS for the core; here the core can be
given explicitly as a reference ligand file, with the RDKit MCS path
gated).
"""
from __future__ import annotations

import argparse
import numpy as np
import pandas as pd

from pointvs_tpu.attribution.attribution import score_atoms
from pointvs_tpu.attribution.attribution_fns import ATTRIBUTION_FNS
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import load_model
from pointvs_tpu.utils import expand_path, mkdir

LOG = get_logger('PointVS-TPU')


def distance_to_core(scored: pd.DataFrame, core_coords: np.ndarray
                     ) -> pd.DataFrame:
    """Per-ligand-atom distance to the closest core atom."""
    lig = scored[scored.bp == 0].copy()
    xyz = np.stack([lig.x, lig.y, lig.z], axis=1)
    diff = xyz[:, None, :] - core_coords[None, :, :]
    lig['core_distance'] = np.sqrt(
        np.einsum('ijk,ijk->ij', diff, diff)).min(axis=1)
    return lig


def mcs_core_coords(lig_files) -> dict:
    """Per-ligand conserved-core coordinates via RDKit FindMCS across the
    whole series (ref constrained_attribution.py:9,123-145). Needs RDKit
    and RDKit-readable ligand files (sdf/mol/mol2)."""
    from rdkit import Chem
    from rdkit.Chem.rdFMCS import FindMCS

    def read(f):
        f = str(f)
        if f.endswith('.sdf'):
            return Chem.SDMolSupplier(f, True, False)[0]
        if f.endswith(('.mol', '.mol2')):
            return (Chem.MolFromMolFile(f) if f.endswith('.mol')
                    else Chem.MolFromMol2File(f))
        raise ValueError(f'FindMCS core detection needs sdf/mol/mol2 '
                         f'ligands, got {f} — pass --core_ligand instead')

    mols = {str(f): read(f) for f in lig_files}
    mcs = Chem.MolFromSmarts(FindMCS(list(mols.values())).smartsString)
    cores = {}
    for path, mol in mols.items():
        matches = mol.GetSubstructMatches(mcs)
        if len(matches) != 1:
            LOG.warning(f'{len(matches)} MCS matches for {path}; expected '
                        f'exactly one — skipping (ref behaviour)')
            continue
        conf = mol.GetConformer()
        cores[path] = np.array(
            [[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y,
              conf.GetAtomPosition(i).z] for i in matches[0]])
    return cores


def constrained_attribution(model_path, rec, lig_files, core_lig=None,
                            attribution: str = 'atom_masking',
                            radius: float = 12, edge_radius: float = 4
                            ) -> pd.DataFrame:
    """Scores + core distances for every ligand in the series.

    The conserved core comes from ``core_lig`` when given (an explicit
    reference ligand file), otherwise from RDKit FindMCS across the
    series — per-ligand core coordinates from that ligand's own matched
    MCS atoms, as the reference does."""
    trainer, _, _ = load_model(model_path)
    per_lig_cores = None
    core_coords = None
    if core_lig is None:
        per_lig_cores = mcs_core_coords(lig_files)
    else:
        core_df = pd.read_parquet(core_lig) if str(core_lig).endswith(
            '.parquet') else None
        if core_df is None:
            from pointvs_tpu.dataset_generation.types_to_parquet import \
                StructuralFileParser
            core_df = StructuralFileParser('ligand').file_to_parquets(
                core_lig)
        core_coords = np.stack([core_df.x, core_df.y, core_df.z], axis=1)

    frames = []
    for lig in lig_files:
        if per_lig_cores is not None:
            core_coords_lig = per_lig_cores.get(str(lig))
            if core_coords_lig is None:
                continue
        else:
            core_coords_lig = core_coords
        scored = score_atoms(trainer, rec, lig,
                             ATTRIBUTION_FNS[attribution],
                             radius=radius, edge_radius=edge_radius)
        frame = distance_to_core(scored, core_coords_lig)
        frame['ligand'] = str(lig)
        frames.append(frame)
    return pd.concat(frames, ignore_index=True)


def plot_distance_vs_score(df: pd.DataFrame, fname):
    from matplotlib import pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.scatter(df.core_distance, df.attribution, s=8, alpha=0.5)
    ax.set_xlabel('Distance from conserved core (A)')
    ax.set_ylabel('Attribution score')
    fig.savefig(expand_path(fname))
    return fig, ax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('model')
    ap.add_argument('receptor')
    ap.add_argument('ligands', nargs='+')
    ap.add_argument('--core_ligand', default=None,
                    help='Explicit core ligand file; omit to detect the '
                         'conserved core with RDKit FindMCS across the '
                         'series (ref behaviour)')
    ap.add_argument('--attribution', default='atom_masking')
    ap.add_argument('--output_dir', '-o', default='constrained_out')
    args = ap.parse_args(argv)
    out = mkdir(args.output_dir)
    df = constrained_attribution(
        args.model, args.receptor, args.ligands,
        core_lig=args.core_ligand, attribution=args.attribution)
    df.to_csv(out / 'constrained_scores.csv', index=False)
    plot_distance_vs_score(df, out / 'distance_vs_score.png')
    LOG.info(f'Outputs in {out}')


if __name__ == '__main__':
    main()
