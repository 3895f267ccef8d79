"""Legacy binary .gninatypes -> parquet conversion.

Ref parity: point_vs/preprocessing/gninatypes_to_parquets.py +
point_vs/preprocessing/atom_types.py (the standalone smina Typer tables —
here re-exported from dataset_generation.types_to_parquet rather than
duplicated). Each gninatypes record is a packed (x, y, z: float32,
type: int32) tuple; receptor types are offset by the 14-channel gnina map.
"""
from __future__ import annotations

import argparse
import struct
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

from pointvs_tpu.dataset_generation.types_to_parquet import (
    SMINA_ATOM_TYPES,
    TYPE_GROUPS,
)
from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, mkdir, no_return_parallelise

LOG = get_logger('PointVS-TPU')

GNINA_N_ATOM_TYPES = 14


def get_type_map(groups=None):
    """smina-type-index -> collapsed channel (generic channel for the
    rest), as the legacy gninatypes path used it."""
    if groups is None:
        # The legacy map used ['Sulfur', 'SulfurAcceptor'] without Selenium
        # (ref gninatypes_to_parquets.py:22-33).
        groups = [g if 'Selenium' not in g else ['Sulfur', 'SulfurAcceptor']
                  for g in TYPE_GROUPS]
    atom_types = [info.sm for info in SMINA_ATOM_TYPES]
    out = {}
    for i, name in enumerate(atom_types):
        for group in groups:
            if name in group:
                out[i] = groups.index(group)
                break
        else:
            out[i] = len(groups)
    return out


def gninatypes_to_parquet(input_filename, output_filename,
                          struct_type: str):
    """One binary gninatypes file -> parquet with the x/y/z/types/bp
    schema."""
    coords, types = [], []
    bp_int = 1 if struct_type == 'receptor' else 0
    with open(input_filename, 'rb') as f:
        size = struct.calcsize('fffi')
        record = f.read(size)
        while record:
            x, y, z, type_int = struct.unpack('fffi', record)
            coords.append((x, y, z))
            types.append(type_int + bp_int * GNINA_N_ATOM_TYPES)
            record = f.read(size)
    df = pd.DataFrame(np.array(coords), columns=['x', 'y', 'z'])
    df['types'] = np.array(types)
    df['bp'] = bp_int
    Path(output_filename).parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(output_filename)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('base_path')
    ap.add_argument('output_dir')
    ap.add_argument('structure_type', choices=('receptor', 'ligand'))
    args = ap.parse_args(argv)
    output_dir = mkdir(args.output_dir)
    input_dir = expand_path(args.base_path)
    inputs, outputs = [], []
    for gt in input_dir.glob('**/*.gninatypes'):
        inputs.append(str(gt))
        outputs.append(str(
            output_dir / gt.relative_to(input_dir).with_suffix('.parquet')))
    no_return_parallelise(
        gninatypes_to_parquet, inputs, outputs, args.structure_type)
    LOG.info(f'Converted {len(inputs)} gninatypes files')


if __name__ == '__main__':
    main()
