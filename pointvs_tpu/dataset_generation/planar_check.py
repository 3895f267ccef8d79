"""Detect degenerate (near-planar) structures in a parquet dataset.

Ref parity: point_vs/dataset_generation/planar_check.py (whose import of a
removed module had rotted — the check itself is reimplemented here): a
structure is flagged when the singular values of its centred coordinates
show (near-)zero extent along one axis.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path

LOG = get_logger('PointVS-TPU')


def is_planar(coords: np.ndarray, tolerance: float = 1e-3) -> bool:
    """True if all points lie within `tolerance` of a common plane."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 4:
        return True
    centred = coords - coords.mean(axis=0)
    singular_values = np.linalg.svd(centred, compute_uv=False)
    return bool(singular_values[-1] / max(len(coords), 1) < tolerance)


def check_parquet(fname, tolerance: float = 1e-3) -> bool:
    df = pd.read_parquet(fname)
    return is_planar(np.stack([df.x, df.y, df.z], axis=1), tolerance)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('root', help='Directory tree of parquet structures')
    ap.add_argument('--tolerance', type=float, default=1e-3)
    args = ap.parse_args(argv)
    flagged = 0
    for parquet in Path(expand_path(args.root)).glob('**/*.parquet'):
        if check_parquet(parquet, args.tolerance):
            LOG.warning(f'PLANAR: {parquet}')
            flagged += 1
    LOG.info(f'{flagged} planar structures found')


if __name__ == '__main__':
    main()
