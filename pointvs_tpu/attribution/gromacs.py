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
from pathlib import Path

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


def gro_to_pdb(input_file, output_file) -> None:
    """Convert a gromacs .gro structure to PDB (ref gromacs.py:37-46 used
    a gromacs ``editconf`` subprocess; the .gro format is fixed-column, so
    this is a pure-Python converter — no gromacs install needed. Falls
    back to editconf for anything it cannot parse)."""
    input_file = expand_path(input_file)
    output_file = expand_path(output_file)
    try:
        lines = open(input_file, 'r', encoding='utf-8').read().splitlines()
        natoms = int(lines[1].split()[0])
        out = []
        for serial, line in enumerate(lines[2:2 + natoms], start=1):
            resid = int(line[0:5])
            resname = line[5:10].strip()
            name = line[10:15].strip()
            # nm -> Angstrom
            x = float(line[20:28]) * 10
            y = float(line[28:36]) * 10
            z = float(line[36:44]) * 10
            record = 'ATOM  ' if resname.upper() != 'HOH' else 'HETATM'
            element = ''.join(c for c in name if c.isalpha())[:2]
            element = (element[0] if len(element) > 1
                       and element[1].islower() else element)[:2]
            out.append(
                f'{record}{serial:5d} {name:<4.4s} {resname:<3.3s} A'
                f'{resid % 10000:4d}    {x:8.3f}{y:8.3f}{z:8.3f}'
                f'  1.00  0.00          {element:>2.2s}')
        out.append('END')
        Path(output_file).write_text('\n'.join(out) + '\n')
    except (ValueError, IndexError):
        if not (shutil.which('editconf') or shutil.which('gmx')):
            raise
        from pointvs_tpu.dataset_generation.generate_types_file import \
            execute_cmd
        binary = 'editconf' if shutil.which('editconf') else 'gmx editconf'
        # gromacs throws an exception even on success (ref :43-46)
        execute_cmd(f'{binary} -f {input_file} -o {output_file}',
                    raise_exceptions=False)


def parse_gromacs_file(gromacs_file):
    """.gro file -> PositionDict from (x, y, z) [Angstrom] to
    'resi:resn:name' atom identifiers (ref gromacs.py:75-105)."""
    from pointvs_tpu.utils import PositionDict
    gromacs_file = expand_path(gromacs_file)
    lines = open(gromacs_file, 'r', encoding='utf-8').read().splitlines()
    natoms = int(lines[1].split()[0])
    result = PositionDict(eps=0.01)
    seen = set()
    for line in lines[2:2 + natoms]:
        resid = line[0:5].strip()
        resname = line[5:10].strip()
        name = line[10:15].strip()
        if resname.lower() == 'hoh':
            continue
        coords = tuple(float(line[c:c + 8]) * 10
                       for c in (20, 28, 36))
        key = (resid, resname, name)
        if key in seen:
            raise RuntimeError(
                f'Cannot determine unique mapping for {gromacs_file}')
        seen.add(key)
        result[coords] = f'{resid}:{resname}:{name}'
    return result


def remove_solvent_pdb(pdb_file) -> None:
    """Strip water/solvent/metal records in place (ref gromacs.py:22-34
    used PyMOL for this; it is a text filter)."""
    solvent = {'HOH', 'WAT', 'SOL', 'TIP', 'T3P', 'NA', 'CL', 'K', 'MG',
               'ZN', 'CA', 'MN', 'FE'}
    pdb_file = expand_path(pdb_file)
    kept = []
    for line in open(pdb_file, 'r', encoding='utf-8'):
        if line.startswith(('ATOM', 'HETATM')) \
                and line[17:20].strip().upper() in solvent:
            continue
        kept.append(line)
    Path(pdb_file).write_text(''.join(kept))


def make_pymol_movie(pdb_files, output_file, ray: bool = False
                     ) -> None:  # pragma: no cover
    """Render an MD-frames movie (mpg/py script) via PyMOL (ref
    gromacs.py PyMOL movie export). Gated on a pymol install."""
    try:
        import pymol
    except ImportError as exc:
        raise SystemExit(
            'PyMOL is not installed — movie export needs the pymol '
            'package (conda install -c conda-forge pymol-open-source)'
        ) from exc
    pymol.finish_launching(['pymol', '-qc'])
    for idx, fname in enumerate(pdb_files):
        pymol.cmd.load(str(expand_path(fname)), 'traj', state=idx + 1)
    pymol.cmd.remove('resn hoh')
    pymol.cmd.remove('solvent')
    pymol.cmd.mset(f'1 -{len(pdb_files)}')
    pymol.cmd.movie.produce(str(expand_path(output_file)),
                            quality=90, preserve=0)
    pymol.cmd.delete('all')


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
    ap.add_argument('--gro_file', default=None,
                    help='Optional .gro structure: converted to PDB (with '
                         'solvent stripped) beside the outputs, and its '
                         'atom-identifier map written as a CSV')
    ap.add_argument('--movie_frames', nargs='*', default=None,
                    help='PDB frames to render as a PyMOL movie '
                         '(requires pymol)')
    args = ap.parse_args(argv)
    out = mkdir(args.output_dir)
    stats = bond_distance_stats(parse_xvg(args.hbnum_xvg))
    stats.to_csv(out / 'bond_stats.csv', index=False)
    scores = pd.read_csv(args.bond_scores_csv)
    rho, p = correlate_md_with_attribution(stats, scores)
    LOG.info(f'Spearman rho={rho:.4f} (p={p:.4g})')
    if args.gro_file:
        pdb_out = out / (Path(args.gro_file).stem + '.pdb')
        gro_to_pdb(args.gro_file, pdb_out)
        remove_solvent_pdb(pdb_out)
        id_map = parse_gromacs_file(args.gro_file)
        pd.DataFrame(
            [{'coords': k, 'atom_id': v} for k, v in id_map.items()]
        ).to_csv(out / 'gro_atom_ids.csv', index=False)
        LOG.info(f'Converted {args.gro_file} -> {pdb_out}')
    if args.movie_frames:
        make_pymol_movie(args.movie_frames, out / 'trajectory.mpg')


if __name__ == '__main__':
    main()
