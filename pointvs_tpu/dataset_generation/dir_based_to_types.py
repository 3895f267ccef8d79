"""Convert directory-layout datasets to types manifests.

Ref parity: point_vs/dataset_generation/dir_based_to_types.py — walk
`<base>/ligands/<rec>_{actives,decoys}/*.parquet`, match receptors in
`<base>/receptors/`, label actives 1 / decoys 0, attach RMSDs from an
optional rmsd_info.yaml.
"""
from __future__ import annotations

import argparse
from pathlib import Path

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, load_yaml

LOG = get_logger('PointVS-TPU')


def directory_to_types(base_path) -> str:
    base_path = expand_path(base_path)

    def relative(p):
        return str(p).replace(str(base_path), '')[1:]

    rmsd_yaml = base_path / 'rmsd_info.yaml'
    rmsd_info = load_yaml(rmsd_yaml) if rmsd_yaml.is_file() else None

    rows = []
    for lig_fname in sorted(Path(base_path, 'ligands').glob('**/*.parquet')):
        suffix = lig_fname.parent.name.split('_')[-1]
        rec_name = lig_fname.parent.name.split('_')[0]
        matches = sorted(
            (base_path / 'receptors').glob(f'{rec_name}*.parquet'))
        if not matches:
            raise RuntimeError(
                f'Receptor for ligand {lig_fname} not found (looking for '
                f'{rec_name}.parquet)')
        rec_fname = matches[0]
        label = 1 if suffix == 'actives' else 0
        rmsd = -1
        if rmsd_info is not None:
            pose_idx = lig_fname.name.split('.')[0].split('_')[-1]
            try:
                rmsd = rmsd_info[rec_name]['docked_wrt_crystal'][
                    int(pose_idx)]
            except (KeyError, ValueError):
                rmsd = -1
        rows.append(f'{label} {rmsd} {relative(rec_fname)} '
                    f'{relative(lig_fname)}')
    return '\n'.join(rows) + ('\n' if rows else '')


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('directory')
    ap.add_argument('--output_fname', '-o', default=None)
    args = ap.parse_args(argv)
    output_fname = Path(args.output_fname or Path(args.directory).name)
    if not output_fname.suffix:
        output_fname = output_fname.with_suffix('.types')
    expand_path(output_fname).write_text(directory_to_types(args.directory))
    LOG.info(f'Wrote {output_fname}')


if __name__ == '__main__':
    main()
