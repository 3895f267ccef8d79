"""Attribution average-precision statistics on synthetic pharmacophores.

Ref parity: point_vs/analysis/synthpharm_atomic_auc.py — per complex, score
atoms with an attribution method, label them from `atomic_labels.yaml`
(coordinate-keyed), and report average precision + top-rank histograms for
ligand and receptor atoms separately.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from pointvs_tpu.attribution.attribution_fns import ATTRIBUTION_FNS
from pointvs_tpu.data.dataset import SynthPharmDataset
from pointvs_tpu.data.single_item import get_single_graph_for_inference
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import load_model
from pointvs_tpu.utils import (
    PositionDict,
    coords_to_string,
    expand_path,
    load_yaml,
    mkdir,
)

LOG = get_logger('PointVS-TPU')


def label_df(df: pd.DataFrame, positions: PositionDict) -> pd.DataFrame:
    coords = np.stack([df.x.to_numpy(), df.y.to_numpy(),
                       df.z.to_numpy()], axis=1)
    df = df.copy()
    df['y_true'] = [int(coords_to_string(coords[i]) in positions)
                    for i in range(len(df))]
    return df


def get_stats_from_dir(model_fname, directory, types, attribution_fn,
                       no_receptor: bool = False, model_task=None):
    from sklearn.metrics import average_precision_score
    trainer, model_kwargs, cmd_args = load_model(model_fname)
    if model_task:
        trainer.set_task(model_task)
    directory = expand_path(directory)
    atom_labels = load_yaml(directory.parent / 'atomic_labels.yaml')
    mol_labels = load_yaml(directory.parent / 'labels.yaml')

    ds = SynthPharmDataset(
        no_receptor=no_receptor, base_path=directory,
        radius=cmd_args.get('radius', 10), polar_hydrogens=False,
        use_atomic_numbers=False, compact=True, types_fname=types,
        edge_radius=cmd_args.get('edge_radius', 4),
        estimate_bonds=cmd_args.get('estimate_bonds', False),
        prune=cmd_args.get('prune', False))

    lig_rand, lig_ap, rec_rand, rec_ap = [], [], [], []
    lig_positions, rec_positions = [], []
    for item in range(len(ds)):
        lig_fname = ds.ligand_fnames[item]
        fname_idx = int(Path(lig_fname).stem.split('lig')[-1])
        if not mol_labels.get(fname_idx):
            continue
        sample = ds[item]
        batch = get_single_graph_for_inference(sample)
        # host_model, not model: strict-graphnorm checkpoints on
        # multi-device hosts bind a psum('dp') inside the sharded step;
        # outside shard_map that axis is unbound (attribution.py:96).
        scores = attribution_fn(trainer.host_model, trainer.params, batch,
                                task=trainer.model_task)
        bp = (sample.node_feats[:, :3].sum(axis=1) > 0).astype(int)
        df = pd.DataFrame({
            'x': sample.coords[:, 0], 'y': sample.coords[:, 1],
            'z': sample.coords[:, 2],
            'bp': bp, 'attribution': scores[:sample.num_nodes]})
        df = label_df(df, PositionDict({
            coords_to_string(c): True for c in atom_labels[fname_idx]}))
        df = df.sort_values(by='attribution', ascending=False)
        lig_df, rec_df = df[df.bp == 0], df[df.bp == 1]
        if len(lig_df) and lig_df.y_true.sum():
            lig_positions += list(np.where(lig_df.y_true > 0.5)[0])[:1]
            lig_rand.append(lig_df.y_true.sum() / len(lig_df))
            lig_ap.append(average_precision_score(
                lig_df.y_true, lig_df.attribution))
        if len(rec_df) and rec_df.y_true.sum():
            rec_positions += list(np.where(rec_df.y_true > 0.5)[0])[:1]
            rec_rand.append(rec_df.y_true.sum() / len(rec_df))
            rec_ap.append(average_precision_score(
                rec_df.y_true, rec_df.attribution))
    return lig_rand, lig_ap, rec_rand, rec_ap, lig_positions, rec_positions


def plot_rank_histogram(lig_ranks, rec_ranks, title=None, fname=None):
    from matplotlib import pyplot as plt
    fig, axs = plt.subplots(2, 1, sharex=True, figsize=(10, 10))
    max_rank = max(lig_ranks + rec_ranks) if (lig_ranks or rec_ranks) else 1
    for idx, (ranks, subtitle) in enumerate(
            zip([lig_ranks, rec_ranks], ['Ligand', 'Receptor'])):
        axs[idx].hist(ranks, bins=list(range(int(max_rank) + 2)))
        axs[idx].set_title(subtitle)
        axs[idx].set_xlabel('Rank of first true positive')
    if title:
        fig.suptitle(title)
    if fname:
        fig.savefig(fname)
    return fig, axs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('model')
    ap.add_argument('directory')
    ap.add_argument('types')
    ap.add_argument('--attribution', default='atom_masking')
    ap.add_argument('--no_receptor', action='store_true')
    ap.add_argument('--output_dir', default='synthpharm_stats')
    args = ap.parse_args(argv)

    out = mkdir(args.output_dir)
    stats = get_stats_from_dir(
        args.model, args.directory, args.types,
        ATTRIBUTION_FNS[args.attribution], no_receptor=args.no_receptor)
    lig_rand, lig_ap, rec_rand, rec_ap, lig_pos, rec_pos = stats
    LOG.info(f'Ligand AP {np.mean(lig_ap):.4f} (random '
             f'{np.mean(lig_rand):.4f}); receptor AP {np.mean(rec_ap):.4f} '
             f'(random {np.mean(rec_rand):.4f})')
    plot_rank_histogram(lig_pos, rec_pos, fname=out / 'rank_histogram.png')


if __name__ == '__main__':
    main()
