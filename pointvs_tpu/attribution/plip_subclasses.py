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
