"""PLIP/PyMOL visualisation layer (gated) + attribution labelling.

Reference counterpart: point_vs/attribution/plip_subclasses.py, whose
PyMOLVisualizerWithBFactorColouring did three jobs:

1. score_atoms: pocket graph -> model -> attribution (now in
   attribution.score_atoms, TPU-batched);
2. colour_b_factors_pdb: write scores as B-factors (now pure-Python in
   attribution.colour_b_factors_pdb);
3. PyMOL session rendering with custom H-bond CGO cylinders — PyMOL is a
   C++ application and is import-gated here (process_pdb saves a .pse when
   available).

This module keeps the precision/recall evaluation of attributions against
interaction labels (PLIP's profiler when importable, the geometric
fallback otherwise).
"""
from __future__ import annotations

from typing import Tuple

import pandas as pd

from pointvs_tpu.attribution.interaction_parser import (
    HAVE_PLIP,
    geometric_interactions,
)
from pointvs_tpu.logging import get_logger

LOG = get_logger('PointVS-TPU')


def get_colour_interpolation_fn(c1, c2, min_val, max_val):
    """Linear RGB interpolation over a score range (ref utils.py:359-390),
    used for the H-bond cylinder colours."""
    import numpy as np
    c1, c2 = np.asarray(c1, dtype=float), np.asarray(c2, dtype=float)
    assert (c2 >= c1).all(), 'All values in c2 must be >= those in c1'
    assert max_val >= min_val, 'max_val must be >= min_val'
    rgb_rng = c2 - c1
    val_rng = max(max_val - min_val, 1e-12)

    def interp(val):
        frac = (float(val) - min_val) / val_rng
        return (c1 + rgb_rng * min(max(frac, 0.0), 1.0)).tolist()

    return interp


# PyMOL cgo CYLINDER opcode (pymol.cgo.CYLINDER); duplicated so the pure
# geometry below stays testable without a PyMOL install.
CYLINDER = 9.0


def hbond_cgo_objects(bonds, inverse_colour: bool = False,
                      radius: float = 0.08):
    """Score-coloured CGO cylinder objects for attribution H-bonds.

    ``bonds`` maps 'id1-id2' -> ((x1,y1,z1), (x2,y2,z2), score). Returns
    [(object_name, cgo_float_list, label_text, label_pos)] — the magenta->
    white colour ramp and 0.08 cylinder radius follow the reference's
    show_hbonds (plip_subclasses.py:69-186). Pure function; the PyMOL
    calls live in render_attribution_pse.
    """
    if not bonds:
        return []
    scores = [b[2] for b in bonds.values()]
    interp = get_colour_interpolation_fn(
        [1.0, 0.0, 1.0], [1.0, 1.0, 1.0], min(scores), max(scores))
    objects = []
    for idx, (identifier, (p1, p2, score)) in enumerate(bonds.items()):
        interp_score = (score if inverse_colour
                        else min(scores) + max(scores) - score)
        col = interp(interp_score)
        cgo = [CYLINDER, *[float(c) for c in p1],
               *[float(c) for c in p2], radius, *col, *col]
        mid = [(a + b) / 2 for a, b in zip(p1, p2)]
        objects.append((f'bond{idx}', cgo, f'{score:.2g}', mid))
    return objects


def render_attribution_pse(pdb_file, pse_path, bfactors=None, bonds=None,
                           ligname: str = None,
                           inverse_colour: bool = False
                           ) -> bool:  # pragma: no cover
    """Full PyMOL session render (ref plip_subclasses.py:69-297,656-843 +
    process_pdb.py:34-232): b-factor spectrum colouring, ligand sticks,
    and score-coloured H-bond CGO cylinders with score labels. Returns
    False (no-op) when PyMOL is not importable.

    ``bfactors``: PositionDict/dict from coords -> score;
    ``bonds``: as hbond_cgo_objects.
    """
    try:
        import pymol
        from pymol import cmd
    except ImportError:
        LOG.info('PyMOL not importable — skipping .pse render')
        return False
    from pointvs_tpu.utils import coords_to_string
    pymol.finish_launching(['pymol', '-qc'])
    cmd.reinitialize()
    cmd.load(str(pdb_file), 'complex')
    cmd.hide('everything', 'all')
    cmd.show('cartoon', 'polymer')
    cmd.show('lines', 'polymer')
    if ligname:
        cmd.select('ligand', f'resn {ligname}')
        cmd.show('sticks', 'ligand')
    if bfactors:
        def modify_bfactor(x, y, z):
            return bfactors.get(coords_to_string((x, y, z)), 0)
        cmd.alter_state(0, '(all)', 'b=modify_bfactor(x, y, z)',
                        space={'modify_bfactor': modify_bfactor},
                        quiet=True)
        cmd.spectrum('b', 'blue_white_red', 'complex')
    for name, cgo, label, mid in hbond_cgo_objects(
            bonds or {}, inverse_colour=inverse_colour):
        cmd.load_cgo(cgo, name)
        ps_name = 'PS_' + name
        cmd.pseudoatom(ps_name, pos=mid, label=label)
        cmd.set('label_color', 'black', ps_name)
        cmd.set('label_size', 20, ps_name)
    cmd.save(str(pse_path))
    cmd.delete('all')
    return True


def label_attributions_with_interactions(
        scored: pd.DataFrame) -> pd.DataFrame:
    """Attach hbd/hba/pistacking labels to a scored structure frame."""
    rec = scored[scored.bp == 1]
    lig = scored[scored.bp == 0]
    labelled_lig = geometric_interactions(rec, lig)
    out = scored.copy()
    for col in ('hbd', 'hba', 'pistacking'):
        out[col] = 0
        out.loc[labelled_lig.index, col] = labelled_lig[col]
    out['interaction'] = (
        (out.hbd + out.hba + out.pistacking) > 0).astype(int)
    return out


def attribution_precision_recall(scored: pd.DataFrame
                                 ) -> Tuple[float, float, pd.DataFrame]:
    """(average_precision, random_baseline, labelled frame) for ligand
    atoms, ranking by attribution (ref attribution.py:63-89, :211-240)."""
    from sklearn.metrics import average_precision_score
    labelled = label_attributions_with_interactions(scored)
    lig = labelled[labelled.bp == 0]
    if not len(lig) or lig.interaction.sum() in (0, len(lig)):
        return float('nan'), float('nan'), labelled
    ap = float(average_precision_score(lig.interaction, lig.attribution))
    random_baseline = float(lig.interaction.mean())
    return ap, random_baseline, labelled
