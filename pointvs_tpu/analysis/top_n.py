"""Top-N pose-ranking metric from a predictions file.

Ref parity: point_vs/analysis/top_n.py. Predictions rows are
``<y_true> | <y_pred> <rec> <lig>``; poses are grouped per receptor, ranked
by predicted score, and top_n is the fraction of receptors whose top-n
ranked poses contain at least one true positive.
"""
from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import pandas as pd

from pointvs_tpu.utils import expand_path


def _extract_scores(predictions_file, exclude_lig_substr=None):
    df = pd.read_csv(expand_path(predictions_file), sep=' ',
                     names=['y_true', '|', 'y_pred', 'rec', 'lig'])
    del df['|']
    if exclude_lig_substr is not None:
        df = df[~df['lig'].str.contains(exclude_lig_substr)]
    df.reset_index(inplace=True, drop=True)
    return df


def _gnn_score(predictions_file, exclude_lig_substr=None):
    scores = defaultdict(list)
    df = _extract_scores(predictions_file, exclude_lig_substr)
    for rec, y_true, y_pred in zip(df['rec'], df['y_true'], df['y_pred']):
        scores[rec].append((float(y_pred), int(y_true)))
    return {rec: sorted(vals, key=lambda x: x[0], reverse=True)
            for rec, vals in scores.items()}


def top_n(predictions_file, n: int = 1, exclude_lig_substr=None) -> float:
    scores = _gnn_score(predictions_file, exclude_lig_substr)
    if not scores:
        return 0.0
    labels_by_rank = [[label for _, label in vals]
                      for vals in scores.values()]
    return sum(1 for ranked in labels_by_rank
               if sum(ranked[:n])) / len(scores)


def extract_vina_rank(lig) -> int:
    """Docked-pose rank from a `<name>_<rank>.parquet`-style filename."""
    return int(Path(Path(lig).name).stem.split('_')[-1])
