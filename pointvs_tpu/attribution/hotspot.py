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


def write_fake_atom_mol(df: pd.DataFrame, fname):
    """Write hotspot positions as a fake-atom SDF for viewers.

    Plain V2000 writer (the reference used RDKit; a hotspot 'molecule' is
    just positioned dummy atoms, which needs no chemistry library).
    """
    lines = ['hotspots', '  PointVS-TPU', '']
    lines.append(f'{len(df):3d}{0:3d}  0  0  0  0  0  0  0  0999 V2000')
    for _, row in df.iterrows():
        lines.append(f'{row.x:10.4f}{row.y:10.4f}{row.z:10.4f} Du  '
                     f'0  0  0  0  0  0  0  0  0  0  0  0')
    lines += ['M  END', '$$$$', '']
    Path(expand_path(fname)).write_text('\n'.join(lines))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('model')
    ap.add_argument('receptor')
    ap.add_argument('fragments', nargs='+',
                    help='Fragment ligand files bound to the receptor')
    ap.add_argument('--attribution', default='atom_masking')
    ap.add_argument('--output_dir', '-o', default='hotspot_out')
    ap.add_argument('--top_n', type=int, default=20)
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
    LOG.info(f'Hotspot outputs in {out}')


if __name__ == '__main__':
    main()
