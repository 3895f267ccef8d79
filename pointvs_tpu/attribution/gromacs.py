"""MD-trajectory hydrogen-bond statistics vs GNN bond attributions.

Ref parity: point_vs/attribution/gromacs.py — parse gromacs H-bond
analyses (xvg / ndx outputs), compute per-bond distance statistics along
the trajectory, and compare them to the model's bond attributions.
Running gromacs itself and PyMOL movie export are external-tool concerns
and are gated; the parsers and the correlation analysis are native.
"""
from __future__ import annotations

import argparse
import shutil
import pandas as pd

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, mkdir

LOG = get_logger('PointVS-TPU')


def parse_xvg(fname) -> pd.DataFrame:
    """gromacs .xvg (time series) -> DataFrame with time + value cols."""
    rows = []
    with open(expand_path(fname), 'r', encoding='utf-8') as f:
        for line in f:
            if line.startswith(('#', '@')):
                continue
            chunks = line.split()
            if chunks:
                rows.append([float(c) for c in chunks])
    if not rows:
        return pd.DataFrame()
    cols = ['time'] + [f'value_{i}' for i in range(len(rows[0]) - 1)]
    return pd.DataFrame(rows, columns=cols)


def parse_hbond_ndx(fname) -> list:
    """gromacs hbond.ndx -> [(donor, hydrogen, acceptor) atom indices]."""
    bonds = []
    in_section = False
    with open(expand_path(fname), 'r', encoding='utf-8') as f:
        for line in f:
            if line.startswith('['):
                in_section = 'hbonds' in line.lower()
                continue
            if in_section:
                chunks = line.split()
                if len(chunks) == 3:
                    bonds.append(tuple(int(c) for c in chunks))
    return bonds


def bond_distance_stats(xvg_df: pd.DataFrame) -> pd.DataFrame:
    """Mean/std/fraction-formed per tracked bond distance column."""
    stats = []
    for col in xvg_df.columns:
        if col == 'time':
            continue
        vals = xvg_df[col].to_numpy()
        stats.append({'bond': col, 'mean': float(vals.mean()),
                      'std': float(vals.std()),
                      'fraction_below_3.5': float((vals < 0.35).mean())})
    return pd.DataFrame(stats)


def run_gmx_hbond(tpr, xtc, output_dir):  # pragma: no cover
    """Invoke gromacs hbond analysis (requires gmx on PATH)."""
    if not shutil.which('gmx'):
        raise SystemExit('gmx binary not found on PATH — install GROMACS '
                         'or supply precomputed .xvg/.ndx files.')
    from pointvs_tpu.dataset_generation.generate_types_file import \
        execute_cmd
    output_dir = mkdir(output_dir)
    execute_cmd(
        f'echo "1 13" | gmx hbond -s {tpr} -f {xtc} '
        f'-num {output_dir}/hbnum.xvg -hbn {output_dir}/hbond.ndx',
        raise_exceptions=False)
    return output_dir


def correlate_md_with_attribution(bond_stats: pd.DataFrame,
                                  bond_scores: pd.DataFrame):
    """Spearman correlation of MD bond stability vs GNN bond scores,
    joined on the bond identifier column."""
    from scipy.stats import spearmanr
    merged = bond_stats.merge(bond_scores, on='bond')
    if len(merged) < 3:
        return float('nan'), 1.0
    rho, p = spearmanr(merged['fraction_below_3.5'], merged['score'])
    return float(rho), float(p)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('hbnum_xvg', help='gromacs hbond distance xvg')
    ap.add_argument('bond_scores_csv',
                    help='CSV with bond, score columns (GNN attributions)')
    ap.add_argument('--output_dir', '-o', default='gromacs_out')
    args = ap.parse_args(argv)
    out = mkdir(args.output_dir)
    stats = bond_distance_stats(parse_xvg(args.hbnum_xvg))
    stats.to_csv(out / 'bond_stats.csv', index=False)
    scores = pd.read_csv(args.bond_scores_csv)
    rho, p = correlate_md_with_attribution(stats, scores)
    LOG.info(f'Spearman rho={rho:.4f} (p={p:.4g})')


if __name__ == '__main__':
    main()
