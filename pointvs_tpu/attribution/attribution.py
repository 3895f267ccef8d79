"""Attribution driver: load model, score a complex, attribute, export.

Ref parity: point_vs/attribution/attribution.py (method registry, PDB
fetching, per-atom score tables) and the scoring core of
plip_subclasses.PyMOLVisualizerWithBFactorColouring.score_atoms
(make_box -> generate_edges -> featurise -> forward -> attribution).

PLIP/PyMOL are CPU-side C++ tools not present in every image; the
interaction-label precision/recall analysis and .pse session export are
import-gated. The B-factor-coloured PDB export is reimplemented here in
pure Python (coordinate-keyed rewrite of the B-factor column), so the main
visualisation artefact needs no PyMOL.

CLI:
    python -m pointvs_tpu.attribution.attribution <method> <model> <out>
        (--pdbid XXXX | --rec r.{pdb,parquet} --lig l.{sdf,parquet})
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from pointvs_tpu.attribution.attribution_fns import ATTRIBUTION_FNS
from pointvs_tpu.data.buckets import GraphSample
from pointvs_tpu.data.preprocessing import (
    concat_structs,
    generate_edges,
    make_bit_vector,
    make_box,
)
from pointvs_tpu.data.single_item import get_single_graph_for_inference
from pointvs_tpu.dataset_generation.types_to_parquet import (
    StructuralFileParser,
)
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import load_model
from pointvs_tpu.utils import PositionDict, coords_to_string, expand_path, \
    mkdir

LOG = get_logger('PointVS-TPU')


def download_pdb_file(pdbid: str, output_dir) -> Path:
    """Fetch a PDB from RCSB (ref attribution.py:34-60)."""
    return StructuralFileParser.download_pdb_file(pdbid, output_dir)


def _structure_frame(rec, lig, n_features: int, extended: bool):
    """rec/lig (parquet or raw structure files) -> concatenated DataFrame."""
    rec, lig = Path(rec), Path(lig)
    parsers = None
    if rec.suffix != '.parquet' or lig.suffix != '.parquet':
        parsers = (StructuralFileParser('ligand', extended),
                   StructuralFileParser('receptor', extended))
    return concat_structs(rec, lig, n_features, parsers=parsers,
                          extended=extended)


def score_atoms(trainer, rec, lig, attribution_fn, radius: float = 12,
                edge_radius: float = 4, estimate_bonds: bool = False,
                prune: bool = False, extended: bool = False,
                only_process: Optional[str] = None) -> pd.DataFrame:
    """Build the pocket graph for one complex and attribute it.

    Returns the boxed structure DataFrame with per-atom scores in an
    `attribution` column (edge methods add `edge_scores` in .attrs).
    """
    del only_process
    n_features = 11 + 8 * extended
    struct = _structure_frame(rec, lig, n_features, extended)
    struct = make_box(struct, radius=radius, relative_to_ligand=True)
    struct = struct[struct['atomic_number'] > 1].reset_index(drop=True)
    intra_radius = 2.0 if estimate_bonds else edge_radius
    struct, (rows, cols), attrs = generate_edges(
        struct, inter_radius=edge_radius, intra_radius=intra_radius,
        prune=prune)
    onehot = np.zeros((len(attrs), 3), dtype=np.float32)
    if len(attrs):
        onehot[np.arange(len(attrs)), attrs] = 1.0

    feats = make_bit_vector(struct.types.to_numpy(), n_features,
                            compact=True)
    coords = np.stack([struct.x, struct.y, struct.z], axis=1)
    sample = GraphSample(
        node_feats=feats.astype(np.float32),
        coords=coords.astype(np.float32),
        senders=rows.astype(np.int32), receivers=cols.astype(np.int32),
        edge_attr=onehot, y=np.float32(0))
    batch = get_single_graph_for_inference(sample)

    task = trainer.model_task
    scores = attribution_fn(trainer.host_model, trainer.params, batch,
                            task=task)

    struct = struct.copy()
    if len(scores) == len(struct):
        struct['attribution'] = scores
    else:  # edge-level method: map bond scores onto their endpoint atoms
        atom_scores = np.zeros(len(struct))
        np.add.at(atom_scores, rows[:len(scores)], scores)
        np.add.at(atom_scores, cols[:len(scores)], scores)
        struct['attribution'] = atom_scores
        struct.attrs['edge_scores'] = scores
        struct.attrs['edge_indices'] = (rows, cols)
    return struct


def colour_b_factors_pdb(input_pdb, output_pdb, scored_struct: pd.DataFrame,
                         eps: float = 1e-2) -> Path:
    """Write a copy of input_pdb with B-factors replaced by attribution
    scores, matched by coordinates (pure-Python replacement for the
    reference's PyMOL b-factor colouring, plip_subclasses.py:656-843)."""
    score_map = PositionDict(eps=eps)
    for _, row in scored_struct.iterrows():
        score_map[(row.x, row.y, row.z)] = float(row.attribution)
    out_lines = []
    matched = 0
    with open(expand_path(input_pdb), 'r', encoding='utf-8',
              errors='replace') as f:
        for line in f:
            if line.startswith(('ATOM', 'HETATM')) and len(line) >= 66:
                coords = (line[30:38], line[38:46], line[46:54])
                try:
                    key = coords_to_string(
                        [float(c) for c in coords], eps=eps)
                    score = score_map.get(key)
                except ValueError:
                    score = None
                if score is not None:
                    line = line[:60] + f'{score:6.2f}' + line[66:]
                    matched += 1
            out_lines.append(line)
    output_pdb = expand_path(output_pdb)
    with open(output_pdb, 'w', encoding='utf-8') as f:
        f.writelines(out_lines)
    LOG.info(f'Wrote {matched} attribution B-factors to {output_pdb}')
    return output_pdb


def attribute(method: str, model_path, output_dir, rec=None, lig=None,
              pdbid: Optional[str] = None, radius: float = 12,
              edge_radius: float = 4, estimate_bonds: bool = False,
              write_pdb: bool = True, **kwargs) -> pd.DataFrame:
    """End-to-end attribution (ref attribution.py:130-242)."""
    if method not in ATTRIBUTION_FNS:
        raise ValueError(
            f'method must be one of {sorted(ATTRIBUTION_FNS)}')
    output_dir = mkdir(output_dir)
    if pdbid is not None:
        rec = download_pdb_file(pdbid, output_dir / pdbid)
    if rec is None or lig is None:
        raise ValueError('Either --pdbid or both --rec and --lig required')

    trainer, model_kwargs, cmd_args = load_model(model_path)
    scored = score_atoms(
        trainer, rec, lig, ATTRIBUTION_FNS[method], radius=radius,
        edge_radius=edge_radius, estimate_bonds=estimate_bonds,
        extended=bool(cmd_args.get('extended_atom_types', False)))

    csv_path = Path(output_dir) / f'{method}_scores.csv'
    scored.to_csv(csv_path, index=False)
    LOG.info(f'Per-atom scores written to {csv_path}')

    # Precision/recall of the attribution against interaction labels
    # (ref attribution.py:211-240; geometric labels when PLIP is absent).
    if 'attribution' in scored and (scored.bp == 0).any() \
            and (scored.bp == 1).any():
        from pointvs_tpu.attribution.plip_subclasses import \
            attribution_precision_recall
        ap, random_baseline, labelled = attribution_precision_recall(scored)
        if np.isfinite(ap):
            LOG.info(f'Attribution average precision vs interaction '
                     f'labels: {ap:.4f} (random {random_baseline:.4f})')
            labelled.to_csv(
                Path(output_dir) / f'{method}_labelled.csv', index=False)

    if write_pdb and Path(rec).suffix == '.pdb':
        colour_b_factors_pdb(
            rec, Path(output_dir) / f'{method}_bfactors.pdb', scored)
    return scored


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('attribution_type',
                    help=f'One of {sorted(ATTRIBUTION_FNS)}')
    ap.add_argument('model', help='Trained run directory or checkpoint')
    ap.add_argument('output_dir')
    ap.add_argument('--pdbid', help='RCSB structure to fetch and score')
    ap.add_argument('--rec', help='Receptor file (pdb or parquet)')
    ap.add_argument('--lig', help='Ligand file (sdf/mol2 or parquet)')
    ap.add_argument('--radius', type=float, default=12)
    ap.add_argument('--edge_radius', type=float, default=4)
    ap.add_argument('--estimate_bonds', action='store_true')
    args = ap.parse_args(argv)
    attribute(args.attribution_type, args.model, args.output_dir,
              rec=args.rec, lig=args.lig, pdbid=args.pdbid,
              radius=args.radius, edge_radius=args.edge_radius,
              estimate_bonds=args.estimate_bonds)


if __name__ == '__main__':
    main()
