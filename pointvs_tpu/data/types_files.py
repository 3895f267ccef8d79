"""Parsers for GNINA-style .types dataset manifests.

Two formats (ref: point_vs/preprocessing/data_loaders.py:523-635):

- classification: ``<label> <...> <rmsd> <receptor_path> <ligand_path> [dE strain_rmsd]``
  where <label> is 0/1 (optional), <rmsd> is the pose RMSD from the crystal
  pose (-1 if unknown), and paths are the first two non-numeric fields.
- regression: ``<pki> <pkd> <ic50> <receptor_path> <ligand_path>`` or just
  ``<receptor_path> <ligand_path>`` (labels None); -1 marks a missing target.

Notes on reference parity: the reference capped strain energies with
``max(200, dE)`` (data_loaders.py:629) which raises *every* dE to >=200; the
evident intent was a cap, so we use ``min(dE, 200)`` here (documented
divergence).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, get_n_cols

LOG = get_logger('PointVS-TPU')


@dataclass
class ClassificationEntries:
    labels: List[Optional[int]] = field(default_factory=list)
    rmsds: List[Optional[float]] = field(default_factory=list)
    receptors: List[str] = field(default_factory=list)
    ligands: List[str] = field(default_factory=list)
    dEs: List[Optional[float]] = field(default_factory=list)
    strain_rmsds: List[Optional[float]] = field(default_factory=list)

    def __len__(self):
        return len(self.ligands)


@dataclass
class RegressionEntries:
    pki: List[Optional[float]] = field(default_factory=list)
    pkd: List[Optional[float]] = field(default_factory=list)
    ic50: List[Optional[float]] = field(default_factory=list)
    receptors: List[str] = field(default_factory=list)
    ligands: List[str] = field(default_factory=list)

    def __len__(self):
        return len(self.ligands)


def _is_float(chunk: str) -> bool:
    try:
        float(chunk)
        return True
    except ValueError:
        return False


def parse_classification_types(types_fname,
                               include_strain_info: bool = False
                               ) -> ClassificationEntries:
    """Parse a classification types file line by line.

    Field discovery mirrors the reference: the first two fields that do not
    parse as floats are the receptor and ligand paths; the float immediately
    before the receptor path is the RMSD; field 0 is the label when integral.
    Lines with exactly two fields are `<receptor> <ligand>` with no label.
    """
    out = ClassificationEntries()
    with open(expand_path(types_fname), 'r', encoding='utf-8') as f:
        for line in f:
            chunks = line.strip().split()
            if not chunks:
                continue
            label = rmsd = recpath = ligpath = None
            d_e = strain_rmsd = None
            if len(chunks) == 2:
                recpath, ligpath = chunks
            else:
                try:
                    label = int(chunks[0])
                except ValueError:
                    label = None
                for idx, chunk in enumerate(chunks):
                    if chunk.startswith('#'):
                        continue
                    if not _is_float(chunk):
                        if recpath is None:
                            recpath = chunk
                            rmsd = float(chunks[idx - 1])
                        elif ligpath is None:
                            ligpath = chunk
                if include_strain_info and len(chunks) >= 2:
                    if _is_float(chunks[-2]):
                        d_e = float(chunks[-2])
                    if _is_float(chunks[-1]):
                        strain_rmsd = float(chunks[-1])
            if recpath is None or ligpath is None:
                continue
            out.labels.append(label)
            out.rmsds.append(rmsd)
            out.receptors.append(recpath)
            out.ligands.append(ligpath)
            if include_strain_info and d_e is not None:
                out.dEs.append(min(d_e, 200.0))  # cap (see module docstring)
                out.strain_rmsds.append(strain_rmsd)
            else:
                out.dEs.append(None)
                out.strain_rmsds.append(None)
    return out


def parse_regression_types(data_root, types_fname) -> RegressionEntries:
    """Parse an affinity-regression types file and drop missing structures."""
    n_cols = get_n_cols(types_fname)
    out = RegressionEntries()
    missing = []
    with open(expand_path(types_fname), 'r', encoding='utf-8') as f:
        for line in f:
            chunks = line.strip().split()
            if not chunks:
                continue
            if n_cols >= 5:
                pki, pkd, ic50 = (float(chunks[0]), float(chunks[1]),
                                  float(chunks[2]))
                rec, lig = chunks[3], chunks[4]
            else:
                pki = pkd = ic50 = None
                rec, lig = chunks[0], chunks[1]
            rec_path = Path(data_root, rec)
            lig_path = Path(data_root, lig)
            if rec_path.is_file() and lig_path.is_file():
                out.pki.append(pki)
                out.pkd.append(pkd)
                out.ic50.append(ic50)
                out.receptors.append(rec)
                out.ligands.append(lig)
            else:
                missing.append((rec, lig))
    if missing:
        LOG.warning('Missing structures:')
        for rec, lig in missing:
            for item in (rec, lig):
                if not Path(data_root, item).is_file():
                    LOG.warning(f'{Path(data_root, item)}')
    return out
