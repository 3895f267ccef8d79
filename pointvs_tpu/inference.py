"""Standalone inference on a test set from a saved checkpoint.

Ref parity: point_vs/inference.py — rebuild the dataloader from the saved
cmd_args.yaml, restore the model, run val() and write a predictions file.

Usage:
    python -m pointvs_tpu.inference <model_dir_or_ckpt> <test_types> \
        <data_root> [--model_task t] [--batch_size N] [--output_fname f]
"""
from __future__ import annotations

import argparse
from pathlib import Path

from pointvs_tpu.data.loader import get_data_loader
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import _resolve, load_model
from pointvs_tpu.utils import expand_path, load_yaml

LOG = get_logger('PointVS-TPU')


def _auto_num_devices(batch_size: int, requested=None) -> int:
    """Largest available device count that divides the batch size."""
    import jax
    available = requested or len(jax.devices())
    for d in range(min(available, batch_size), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def get_model_and_test_dl(model_path, test_types, data_root,
                          model_task=None, batch_size=None,
                          num_devices=None):
    """(trainer, dataloader) rebuilt from a run directory
    (ref inference.py:35-74)."""
    _, root = _resolve(model_path)
    cmd_args_peek = (load_yaml(root / 'cmd_args.yaml')
                     if (root / 'cmd_args.yaml').exists() else {})
    bs = batch_size or cmd_args_peek.get('batch_size', 32)
    num_devices = _auto_num_devices(bs, num_devices)
    trainer, model_kwargs, cmd_args = load_model(
        model_path, num_devices=num_devices)
    model_task = model_task or model_kwargs.get(
        'model_task', 'classification')
    if model_task == 'both':
        model_task = 'classification'
    trainer.set_task(model_task)
    dl = get_data_loader(
        data_root,
        batch_size=batch_size or cmd_args.get('batch_size', 32),
        compact=cmd_args.get('compact', True),
        radius=cmd_args.get('radius', 10),
        use_atomic_numbers=cmd_args.get('use_atomic_numbers', False),
        rot=False,
        polar_hydrogens=cmd_args.get('hydrogens', False),
        fname_suffix=cmd_args.get('input_suffix', 'parquet'),
        edge_radius=cmd_args.get('edge_radius', 4.0),
        estimate_bonds=cmd_args.get('estimate_bonds', False),
        prune=cmd_args.get('prune', False),
        extended_atom_types=cmd_args.get('extended_atom_types', False),
        types_fname=test_types, mode='val', model_task=model_task,
        num_devices=trainer.num_devices,
        layout={'pair': 'pair', 'dense': 'dense'}.get(
            trainer.input_kind, 'graph'))
    return trainer, dl


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('model_path', help='Run directory or checkpoint')
    parser.add_argument('test_types', help='Types file for the test set')
    parser.add_argument('data_root', help='Root for parquet paths')
    parser.add_argument('--model_task', default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--output_fname', default='predictions.txt')
    parser.add_argument('--num_devices', type=int, default=None)
    parser.add_argument('--top1', action='store_true')
    args = parser.parse_args(argv)

    trainer, dl = get_model_and_test_dl(
        args.model_path, args.test_types, args.data_root,
        model_task=args.model_task, batch_size=args.batch_size,
        num_devices=args.num_devices)
    out = expand_path(trainer.save_path) / args.output_fname
    trainer.val(dl, predictions_file=Path(out), top1_on_end=args.top1)
    LOG.info(f'Predictions written beside {out}')


if __name__ == '__main__':
    main()
