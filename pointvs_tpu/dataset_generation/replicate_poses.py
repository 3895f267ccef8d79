"""Scale-test data generator: replicate a pose library with rigid
perturbations.

Produces reference-scale datasets from a small seed set (the reference's
production config trains on ~19k PDBBind complexes and its stretch goal
is ~1M-pose screening — neither dataset ships with the repo), so the
framework's behaviour beyond every cache can be MEASURED instead of
extrapolated: cold first epochs, in-memory-cache overflow, device-store
budget overflow, chunked screening.

Each output pose = a seed ligand parquet with its coordinates rotated
uniformly about the ligand centroid plus a small random translation
(default <= 0.5 A), so the pose stays in the pocket and keeps its label;
receptors are shared via symlinks. Deterministic under --seed.

Usage:
  python -m pointvs_tpu.dataset_generation.replicate_poses train \
      <src_root> <src.types> <out_root> --copies 19 [--seed 0]
  python -m pointvs_tpu.dataset_generation.replicate_poses screen \
      <src_root> <receptor_id> <out_dir> --n_poses 100000 [--seed 0]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from pointvs_tpu.logging import get_logger

LOG = get_logger('PointVS-TPU')


def _perturb(df: pd.DataFrame, rng, max_shift: float = 0.5) -> pd.DataFrame:
    """Rigid perturbation about the ligand centroid + bounded jitter."""
    from pointvs_tpu.data.preprocessing import random_rotation_matrix
    xyz = df[['x', 'y', 'z']].to_numpy(np.float64)
    centre = xyz.mean(axis=0)
    m = random_rotation_matrix(rng)
    shift = rng.normal(size=3)
    norm = np.linalg.norm(shift)
    shift = shift / max(norm, 1e-9) * rng.uniform(0, max_shift)
    out = df.copy()
    out[['x', 'y', 'z']] = (xyz - centre) @ m + centre + shift
    return out


def make_train_set(src_root, src_types, out_root, copies: int = 19,
                   seed: int = 0, max_shift: float = 0.5) -> Path:
    """Replicate every entry of ``src_types`` ``copies`` times.

    Output: <out_root>/ligands/... perturbed parquets,
    <out_root>/receptors -> symlink to the source receptors,
    <out_root>/scale.types with the original label/RMSD columns.
    """
    src_root, out_root = Path(src_root), Path(out_root)
    (out_root / 'ligands').mkdir(parents=True, exist_ok=True)
    rec_link = out_root / 'receptors'
    if not rec_link.exists():
        rec_link.symlink_to(src_root / 'receptors')
    rng = np.random.RandomState(seed)
    lines_out = []
    cache = {}
    src_lines = Path(src_types).read_text().splitlines()
    for li, line in enumerate(src_lines):
        parts = line.split()
        if len(parts) < 5:
            continue
        head, rec, lig = parts[:-2], parts[-2], parts[-1]
        if lig not in cache:
            cache[lig] = pd.read_parquet(src_root / lig)
        df = cache[lig]
        stem = Path(lig).stem
        for c in range(copies):
            rel = f'ligands/{stem}_r{li}_{c}.parquet'
            _perturb(df, rng, max_shift).to_parquet(out_root / rel)
            lines_out.append(' '.join(head + [rec, rel]))
        if li % 100 == 0:
            LOG.info(f'{li}/{len(src_lines)} seed poses replicated')
    types_out = out_root / 'scale.types'
    types_out.write_text('\n'.join(lines_out) + '\n')
    LOG.info(f'{len(lines_out)} training poses -> {types_out}')
    return types_out


def make_screen_library(src_root, receptor_id, out_dir,
                        n_poses: int = 100000, seed: int = 0,
                        max_shift: float = 0.5) -> Path:
    """Perturbed copies of every ligand pose of one receptor, round-robin
    until ``n_poses`` files exist in ``out_dir``."""
    src_root, out_dir = Path(src_root), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    seeds = sorted((src_root / 'ligands').glob(f'{receptor_id}_*/*.parquet'))
    if not seeds:
        raise SystemExit(f'no ligands for receptor {receptor_id}')
    frames = [pd.read_parquet(p) for p in seeds]
    rng = np.random.RandomState(seed)
    n_written = 0
    c = 0
    while n_written < n_poses:
        for p, df in zip(seeds, frames):
            if n_written >= n_poses:
                break
            rel = out_dir / f'{p.stem}_p{c}.parquet'
            _perturb(df, rng, max_shift).to_parquet(rel)
            n_written += 1
            if n_written % 10000 == 0:
                LOG.info(f'{n_written}/{n_poses} screen poses written')
        c += 1
    LOG.info(f'{n_written} screen poses in {out_dir}')
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest='cmd', required=True)
    t = sub.add_parser('train')
    t.add_argument('src_root')
    t.add_argument('src_types')
    t.add_argument('out_root')
    t.add_argument('--copies', type=int, default=19)
    t.add_argument('--seed', type=int, default=0)
    t.add_argument('--max_shift', type=float, default=0.5)
    s = sub.add_parser('screen')
    s.add_argument('src_root')
    s.add_argument('receptor_id')
    s.add_argument('out_dir')
    s.add_argument('--n_poses', type=int, default=100000)
    s.add_argument('--seed', type=int, default=0)
    s.add_argument('--max_shift', type=float, default=0.5)
    args = ap.parse_args(argv)
    if args.cmd == 'train':
        make_train_set(args.src_root, args.src_types, args.out_root,
                       copies=args.copies, seed=args.seed,
                       max_shift=args.max_shift)
    else:
        make_screen_library(args.src_root, args.receptor_id, args.out_dir,
                            n_poses=args.n_poses, seed=args.seed,
                            max_shift=args.max_shift)


if __name__ == '__main__':
    main()
